"""Physical-layout guarantees: bucketed joins really skip the shuffle and
partitioned reads really prune — asserted on the executed plan, not just
on result values (the plan IS the feature here)."""

from end_to_end_datapipeline_project_spark.physical import (
    q_bucketed_join,
    q_medallion_roundtrip,
)


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle_under_the_join(spark, sf_dir):
    df = q_bucketed_join(spark, sf_dir)
    plan = _executed_plan(df)
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    # exactly ONE exchange: the post-join groupBy; none feeding the join
    join_part = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange hashpartitioning" not in join_part
    assert df.count() == 5  # one row per order priority


def test_medallion_roundtrip_prunes_partitions(spark, sf_dir):
    df = q_medallion_roundtrip(spark, sf_dir)
    plan = _executed_plan(df)
    [scan_line] = [l for l in plan.split("\n") if "PartitionFilters" in l]
    assert "date" in scan_line.split("PartitionFilters", 1)[1][:120]
    rows = df.collect()
    assert all(str(r.date) >= "2024-01-10" and str(r.date) < "2024-01-20" for r in rows)


def test_bloom_join_injects_runtime_filter(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.physical import q_bloom_join

    df = q_bloom_join(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in optimized  # fact scan probes the Bloom filter
    [row] = df.collect()
    assert row.n_items > 0
    # and the isolated session did not leak conf into the shared one
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"


def test_zorder_files_cover_narrow_squares(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.physical import q_zorder_layout

    rows = q_zorder_layout(spark, sf_dir).collect()
    assert len(rows) == 64
    # 64 files over a 16-bit z-space = 1024 z-values/file = a 32x32 square:
    # every file is guaranteed a narrow range in BOTH dimensions, which is
    # exactly the property min/max footer skipping needs.
    for r in rows:
        assert r.max_bx - r.min_bx <= 31, r
        assert r.max_by - r.min_by <= 31, r


def test_hll_sketches_merge_and_estimate(spark, sf_dir):
    import pyspark.sql.functions as F

    from end_to_end_datapipeline_project_spark.physical import (
        hll_daily_sketches,
        hll_rollup,
    )
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table

    sketches = hll_daily_sketches(spark, sf_dir).cache()
    per_type = {
        r.event_type: r.approx_distinct_users
        for r in hll_rollup(sketches, "event_type").collect()
    }
    exact = {
        r.event_type: r.d
        for r in read_parquet_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    for et, est in per_type.items():
        assert abs(est - exact[et]) / exact[et] < 0.05
    # mergeability: union of per-day sketches == overall distinct estimate
    [overall] = hll_rollup(sketches).collect()
    [direct] = (
        read_parquet_table(spark, sf_dir, "events")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("d"))
        .collect()
    )
    assert overall.approx_distinct_users == direct.d
    sketches.unpersist()


def test_dynamic_partition_pruning_in_plan(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.physical import (
        q_dynamic_partition_pruning,
    )

    df = q_dynamic_partition_pruning(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan
    # every surviving date satisfies the dim predicate
    for r in df.collect():
        assert r.date.day % 10 == 3


def test_compaction_bounds_file_count(spark, sf_dir):
    import glob

    from end_to_end_datapipeline_project_spark.physical import (
        _COMPACT_SHARDS,
        _COMPACT_TARGET_FILES,
        _stage,
        q_compact_small_files,
    )

    row = q_compact_small_files(spark, sf_dir).first()
    assert row.n_rows == row.n_docs  # no loss, no duplication
    frag = glob.glob(f"{_stage(sf_dir, 'frag_documents')}/part-*.parquet")
    compact = glob.glob(
        f"{_stage(sf_dir, 'compact_documents')}/part-*.parquet"
    )
    assert len(frag) == _COMPACT_SHARDS
    assert 1 <= len(compact) <= _COMPACT_TARGET_FILES


def test_parquet_bloom_point_lookup_pushdown(spark, sf_dir, tmp_path):
    """The IN point lookup must reach the bloom-filtered parquet scan as
    a pushed filter (row-group skipping happens inside parquet-mr; the
    pushed predicate is its prerequisite), and the bloom write option
    must demonstrably take effect: two same-layout rewrites of the same
    data differ in size exactly by the bloom sidecars."""
    import glob
    import os

    from end_to_end_datapipeline_project_spark.physical import (
        _stage,
        q_parquet_bloom_skip,
    )

    df = q_parquet_bloom_skip(spark, sf_dir)
    df.collect()
    plan = _executed_plan(df)
    scan_lines = [  # AQE prints the scan in both initial and final plan
        l for l in plan.split("\n")
        if "PushedFilters" in l and "o_custkey" in l
    ]
    assert scan_lines
    assert all(
        "In(o_custkey" in l.split("PushedFilters", 1)[1]
        for l in scan_lines
    )
    # footer-level proof: same data, same single-file layout, with and
    # without the bloom option - the bloom copy must be strictly larger
    # (the sidecar is an NDV-sized bitset per row group)
    src_df = spark.read.parquet(_stage(sf_dir, "orders_bloom_v2")).coalesce(1)
    probes = {}
    # dictionary disabled on BOTH probes (parquet-mr skips blooms for
    # fully-dictionary-encoded columns), so the size delta isolates the
    # bloom sidecar itself
    for name, opts in (
        ("plain", {"parquet.enable.dictionary#o_custkey": "false"}),
        ("bloomed", {
            "parquet.bloom.filter.enabled#o_custkey": "true",
            "parquet.bloom.filter.expected.ndv#o_custkey": "20000",
            "parquet.enable.dictionary#o_custkey": "false",
        }),
    ):
        # tmp_path, not the shared content-keyed stage: probe dirs are
        # throwaway and a deterministic shared path would race between
        # concurrent suite runs (claim_staged exists for exactly that;
        # per-test tmp_path sidesteps it entirely)
        out = str(tmp_path / f"probe_{name}")
        w = src_df.write.mode("overwrite")
        for k, v in opts.items():
            w = w.option(k, v)
        w.parquet(out)
        probes[name] = sum(
            os.path.getsize(f) for f in glob.glob(f"{out}/*.parquet")
        )
    assert probes["bloomed"] > probes["plain"]

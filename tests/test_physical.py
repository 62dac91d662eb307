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

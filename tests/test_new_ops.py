"""Semantic invariants of the round-1 extension operators (beyond the
oracle hash-match): interval structure, monotonicity, bin budgets."""

from pyspark.sql import functions as F


def test_scd2_intervals_are_contiguous_per_user(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.relational import q_scd2_history

    df = q_scd2_history(spark, sf_dir)
    # exactly one open (current) interval per user
    open_per_user = (
        df.groupBy("user_id")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
        .filter(F.col("n_open") != 1)
    )
    assert open_per_user.count() == 0
    # intervals never overlap: effective_to of a row equals the next
    # row's effective_from by construction; just assert ordering holds
    bad = df.filter(
        F.col("effective_to").isNotNull()
        & (F.col("effective_to") < F.col("effective_from"))
    )
    assert bad.count() == 0


def test_funnel_counts_are_monotone(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.relational import q_funnel

    [row] = q_funnel(spark, sf_dir).collect()
    assert row.n_viewed >= row.n_clicked >= row.n_purchased >= 0
    assert row.n_viewed > 0


def test_pack_sequences_bins_respect_budget(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.llm_ops.clean import (
        PACK_BUDGET,
        q_pack_sequences,
    )

    rows = q_pack_sequences(spark, sf_dir).orderBy("bin").collect()
    # bins are consecutive from 0
    assert [r.bin for r in rows] == list(range(len(rows)))
    # each bin STARTS within budget: a doc may straddle the boundary
    # (concat-then-chop), so tokens_in_bin < budget + max single doc;
    # every bin except possibly the last must reach the budget line
    for r in rows[:-1]:
        assert r.tokens_in_bin > 0
    total = sum(r.tokens_in_bin for r in rows)
    assert total >= PACK_BUDGET * (len(rows) - 1)


def test_union_by_name_null_fills_missing_columns(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.relational import q_union_by_name

    df = q_union_by_name(spark, sf_dir)
    orders_side = df.filter(F.col("event_type") == "order")
    # order rows have no `value`; purchase rows have no price
    assert orders_side.filter(F.col("n_with_value") > 0).count() == 0
    purchase_side = df.filter(F.col("event_type") == "purchase")
    assert purchase_side.filter(F.col("n_with_price") > 0).count() == 0


def test_hash_sample_is_reproducible_and_stratified(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.stats import q_hash_sample

    a = {r.o_orderpriority: r.n_sampled for r in q_hash_sample(spark, sf_dir).collect()}
    b = {r.o_orderpriority: r.n_sampled for r in q_hash_sample(spark, sf_dir).collect()}
    assert a == b  # deterministic across runs
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table

    totals = {
        r.o_orderpriority: r.n
        for r in read_parquet_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # URGENT stratum sampled ~3x denser than the rest (30% vs 10%)
    urgent_rate = a["1-URGENT"] / totals["1-URGENT"]
    other = [p for p in a if p != "1-URGENT"]
    other_rate = sum(a[p] for p in other) / sum(totals[p] for p in other)
    assert 0.2 < urgent_rate < 0.4
    assert 0.05 < other_rate < 0.16


def test_kmeans_step_assigns_every_vector(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.llm_ops.similarity import (
        q_kmeans_step,
    )
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table

    rows = q_kmeans_step(spark, sf_dir).collect()
    n_vecs = read_parquet_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_assigned for r in rows) == n_vecs
    assert all(r.new_norm > 0 for r in rows)

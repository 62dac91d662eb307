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


def test_chunk_dedup_retention_bounds(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.llm_ops.dedup import q_chunk_dedup

    df = q_chunk_dedup(spark, sf_dir)
    rows = df.collect()
    assert rows, "chunk dedup produced no documents"
    for r in rows:
        # a doc may be 100% boilerplate (every chunk seen earlier) -> 0
        assert 0 <= r.n_kept <= r.n_chunks
        assert 0.0 <= r.retention <= 1.0
    assert any(r.n_kept > 0 for r in rows)
    # corpus-wide, every chunk fingerprint has exactly one survivor:
    # total kept == number of distinct chunk fingerprints
    total_kept = sum(r.n_kept for r in rows)
    assert total_kept <= sum(r.n_chunks for r in rows)


def test_incremental_dedup_partitions_batch(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.llm_ops.dedup import (
        q_incremental_dedup,
    )

    rows = q_incremental_dedup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # every batch row is exactly one of duplicate / novel
        assert r.n_dup_vs_base + r.n_novel == r.n_batch
    # re-ingested copies (doc_id % 10 == 0) must be flagged duplicate;
    # edited docs (% 10 == 5) must be novel
    assert sum(r.n_dup_vs_base for r in rows) > 0
    assert sum(r.n_novel for r in rows) > 0


def test_bm25_scores_ranked_and_positive(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.llm_ops.text import q_bm25

    rows = q_bm25(spark, sf_dir).collect()
    assert rows
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    assert all(1 <= r.n_terms_hit <= 3 for r in rows)


def test_length_outlier_filter_band(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.llm_ops.clean import (
        q_length_outlier_filter,
    )

    rows = q_length_outlier_filter(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.lo <= r.hi
        # p5..p95 band keeps roughly 90%, never everything dropped
        assert 0 < r.n_kept <= r.n_docs


def test_source_mix_weights_rebalance(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.llm_ops.clean import q_source_mix

    rows = q_source_mix(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.actual_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        # weight * actual_share == target_share (up to rounding)
        assert abs(r.weight * r.actual_share - r.target_share) < 1e-4


def test_zscore_anomaly_flags_are_extreme(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.timeseries import q_zscore_anomaly

    rows = q_zscore_anomaly(spark, sf_dir).collect()
    # flagged rows must exceed the threshold strictly
    for r in rows:
        assert abs(r.zscore) > 2.0


def test_large_orders_threshold_and_order(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.relational import q_large_orders

    rows = q_large_orders(spark, sf_dir).collect()
    prices = [r.o_totalprice for r in rows]
    assert prices == sorted(prices, reverse=True)
    assert all(r.total_qty > 250.0 for r in rows)


def test_order_count_distribution_mass_balance(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.relational import (
        q_order_count_distribution,
    )
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table

    rows = q_order_count_distribution(spark, sf_dir).collect()
    n_cust = read_parquet_table(spark, sf_dir, "customer").count()
    # the distribution covers every customer exactly once
    assert sum(r.custdist for r in rows) == n_cust


def test_dq_expectations_rules_complete(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.pipeline_queries import (
        q_dq_expectations,
    )

    rows = {r.rule: r for r in q_dq_expectations(spark, sf_dir).collect()}
    assert set(rows) == {
        "orders_pk_unique",
        "orders_totalprice_nonneg",
        "orders_status_domain",
        "lineitem_qty_range",
        "lineitem_discount_cap",
        "lineitem_fk_orders",
    }
    for r in rows.values():
        assert 0 <= r.n_violations <= r.n_checked
    # clean synthetic data: PK and FK hold
    assert rows["orders_pk_unique"].n_violations == 0
    assert rows["lineitem_fk_orders"].n_violations == 0


def test_concurrency_two_pass_matches_global(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.pipeline_queries import (
        q_concurrency,
    )
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    got = {
        r.day: r.max_concurrent
        for r in q_concurrency(spark, sf_dir).collect()
    }
    # reference: single global running sum (the oracle formulation)
    ev = read_parquet_table(spark, sf_dir, "events")
    pts = ev.select(F.col("ts").alias("t"), F.lit(1).alias("delta")).unionAll(
        ev.select(
            (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w = Window.orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        r.day: r.mc
        for r in pts.withColumn("conc", F.sum("delta").over(w))
        .groupBy(F.to_date("t").alias("day"))
        .agg(F.max("conc").alias("mc"))
        .collect()
    }
    assert got == want
    assert max(got.values()) >= 1


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.stats import q_weighted_sample
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table
    from pyspark.sql import functions as F

    rows = q_weighted_sample(spark, sf_dir).collect()
    assert len(rows) == 20
    keys = [r.sample_key for r in rows]
    assert keys == sorted(keys, reverse=True)
    assert all(0.0 < k < 1.0 for k in keys)
    # weighted by n_chars: the sample skews longer than the corpus mean
    corpus_mean = (
        read_parquet_table(spark, sf_dir, "documents")
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > corpus_mean * 0.9


def test_chi2_shape(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.stats import q_chi2_independence

    [row] = q_chi2_independence(spark, sf_dir).collect()
    assert row.chi2 >= 0.0
    assert row.dof == (5 - 1) * (20 - 1)
    assert row.n > 0


def test_token_entropy_bounds(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.llm_ops.text import (
        q_token_entropy,
    )
    import math

    rows = q_token_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 0 <= H <= ln(vocab_size)
        assert -1e-9 <= r.entropy <= math.log(r.vocab_size) + 1e-9
        assert r.n_tokens >= r.vocab_size


def test_logreg_grad_matches_numpy(spark, sf_dir):
    import numpy as np

    from end_to_end_datapipeline_project_spark.llm_ops.similarity import (
        q_logreg_grad,
    )
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table

    got = {r.dim: r.grad for r in q_logreg_grad(spark, sf_dir).collect()}
    emb = read_parquet_table(spark, sf_dir, "embeddings").collect()
    X = np.array([[float(v) for v in r.embedding] for r in emb])
    y = np.array([r.label % 2 for r in emb], dtype=float)
    d = X.shape[1]
    w = np.array([((j * 37) % 19 - 9) / 10.0 for j in range(1, d + 1)])
    p = 1.0 / (1.0 + np.exp(-X @ w))
    want = (X * (p - y)[:, None]).sum(axis=0) / len(y)
    assert set(got) == set(range(1, d + 1))
    for j in range(1, d + 1):
        assert abs(got[j] - want[j - 1]) < 1e-5


def test_quantile_bucketing_equi_depth(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.stats import q_quantile_bucketing

    rows = sorted(
        q_quantile_bucketing(spark, sf_dir).collect(), key=lambda r: r.bucket
    )
    assert [r.bucket for r in rows] == list(range(1, 11))
    counts = [r.n for r in rows]
    # equi-depth: every decile within 25% of the mean bucket size
    mean = sum(counts) / len(counts)
    assert all(abs(c - mean) <= 0.25 * mean + 1 for c in counts)
    # buckets tile the value range in order
    for lo_r, hi_r in zip(rows, rows[1:]):
        assert lo_r.hi <= hi_r.lo + 1e-6


def test_per_group_sample_is_deterministic(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.stats import q_per_group_sample

    a = {(r.event_type, r.event_id) for r in q_per_group_sample(spark, sf_dir).collect()}
    b = {(r.event_type, r.event_id) for r in q_per_group_sample(spark, sf_dir).collect()}
    assert a == b
    per_type = {}
    for t, _ in a:
        per_type[t] = per_type.get(t, 0) + 1
    assert all(n == 5 for n in per_type.values())


def test_mad_outliers_bounded(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.stats import q_mad_outliers

    rows = q_mad_outliers(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.mad >= 0.0
        # MAD flags are rare by construction (<20% of any group)
        assert r.n_outliers <= 0.2 * r.n


def test_seasonality_index_centered(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.timeseries import q_seasonality

    rows = q_seasonality(spark, sf_dir).collect()
    assert rows
    assert all(0 <= r.dow <= 6 for r in rows)
    # weighted mean of seasonal_index per type == 1 by construction
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        tot = sum(r.n for r in rs)
        w_mean = sum(r.seasonal_index * r.n for r in rs) / tot
        assert abs(w_mean - 1.0) < 1e-3


def test_attribution_window_semantics(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.timeseries import q_attribution

    rows = q_attribution(spark, sf_dir).collect()
    assert rows
    import datetime

    day = datetime.timedelta(days=1)
    for r in rows:
        if r.attributed:
            assert r.last_click_ts is not None
            assert r.last_click_ts <= r.purchase_ts
            assert r.purchase_ts - r.last_click_ts <= day
        elif r.last_click_ts is not None:
            # unattributed with a click -> click is stale (> 1 day old)
            assert r.purchase_ts - r.last_click_ts > day


def test_geo_heatmap_covers_all_pings(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.spatial import q_geo_heatmap
    from end_to_end_datapipeline_project_spark.pipeline_queries import (
        events_typed,
    )

    rows = q_geo_heatmap(spark, sf_dir).collect()
    total = events_typed(spark, sf_dir).count()
    assert sum(r.n_pings for r in rows) == total
    for r in rows:
        assert 1 <= r.n_users <= r.n_pings


def test_stream_upsert_keeps_latest(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.streaming_queries import (
        q_stream_upsert,
    )
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table

    final = {r.user_id: r for r in q_stream_upsert(spark, sf_dir).collect()}
    ev = read_parquet_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert len(final) == n_users
    # spot-check: the stored row is the user's max (ts, event_id)
    import pyspark.sql.functions as F

    latest = {
        r.user_id: (r.mts, r.meid)
        for r in ev.groupBy("user_id")
        .agg(F.max("ts").alias("mts"), F.max_by("event_id", F.struct("ts", "event_id")).alias("meid"))
        .collect()
    }
    for uid, row in final.items():
        assert row.ts == latest[uid][0]


def test_bitmap_distinct_equals_exact(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.relational import (
        q_bitmap_distinct,
    )
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table

    got = {
        r.o_orderpriority: r.distinct_customers
        for r in q_bitmap_distinct(spark, sf_dir).collect()
    }
    exact = {
        r.o_orderpriority: r.d
        for r in read_parquet_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("d"))
        .collect()
    }
    assert got == exact


def test_pareto_frontier_is_mutually_nondominating(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.relational import (
        q_pareto_frontier,
    )
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table

    sky = q_pareto_frontier(spark, sf_dir).collect()
    assert len(sky) > 0
    for p in sky:
        for q in sky:
            dominates = (
                q.p_retailprice <= p.p_retailprice
                and q.p_size >= p.p_size
                and (q.p_retailprice < p.p_retailprice or q.p_size > p.p_size)
            )
            assert not dominates
    # every non-frontier point is dominated by some frontier point
    part = read_parquet_table(spark, sf_dir, "part")
    frontier_keys = {p.p_partkey for p in sky}
    sample = (
        part.filter(~F.col("p_partkey").isin(*frontier_keys)).limit(50).collect()
    )
    for row in sample:
        assert any(
            q.p_retailprice <= row.p_retailprice
            and q.p_size >= row.p_size
            and (q.p_retailprice < row.p_retailprice or q.p_size > row.p_size)
            for q in sky
        )


def test_anova_sums_of_squares_decompose(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table
    from end_to_end_datapipeline_project_spark.stats import q_anova

    [row] = q_anova(spark, sf_dir).collect()
    assert row.k >= 2
    assert row.ss_between >= 0 and row.ss_within >= 0 and row.f_stat >= 0
    li = read_parquet_table(spark, sf_dir, "lineitem")
    n = li.count()
    assert row.n_total == n
    # SS_between + SS_within == total SS about the grand mean
    [tot] = (
        li.select(
            (
                F.sum(F.col("l_quantity") * F.col("l_quantity"))
                - F.pow(F.sum("l_quantity"), 2) / n
            ).alias("sst")
        )
    ).collect()
    assert abs((row.ss_between + row.ss_within) - tot.sst) < 1e-2


def test_table_diff_statuses_partition_the_keyspace(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.pipeline_queries import (
        q_table_diff,
    )
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table

    got = {r.status: r.n_rows for r in q_table_diff(spark, sf_dir).collect()}
    orders = read_parquet_table(spark, sf_dir, "orders")
    n = {
        name: orders.filter(cond).count()
        for name, cond in [
            ("added", "o_orderkey % 89 = 0 AND o_orderkey % 83 <> 0"),
            ("removed", "o_orderkey % 83 = 0 AND o_orderkey % 89 <> 0"),
            (
                "changed",
                "o_orderkey % 97 = 0 AND o_orderkey % 89 <> 0 "
                "AND o_orderkey % 83 <> 0",
            ),
        ]
    }
    assert got["added"] == n["added"]
    assert got["removed"] == n["removed"]
    assert got["changed"] == n["changed"]
    assert (
        sum(got.values())
        == orders.filter("o_orderkey % 89 <> 0 OR o_orderkey % 83 <> 0").count()
    )


def test_event_transitions_rows_normalize(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.pipeline_queries import (
        q_event_transitions,
    )

    rows = q_event_transitions(spark, sf_dir).collect()
    assert rows
    by_from = {}
    for r in rows:
        assert 0.0 <= r.p <= 1.0 and r.n_transitions > 0
        by_from.setdefault(r.from_event, 0.0)
        by_from[r.from_event] += r.p
    for total in by_from.values():
        assert abs(total - 1.0) < 1e-4


def test_acf_lag_bounds_and_pair_counts(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table
    from end_to_end_datapipeline_project_spark.timeseries import q_acf

    rows = sorted(q_acf(spark, sf_dir).collect(), key=lambda r: r.lag)
    assert [r.lag for r in rows] == [1, 2, 3, 4, 5, 6, 7]
    n_days = (
        read_parquet_table(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate"))
        .distinct()
        .count()
    )
    for r in rows:
        assert -1.0 <= r.acf <= 1.0
        assert r.n_pairs == n_days - r.lag


def test_moments_match_builtin_aggregates(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table
    from end_to_end_datapipeline_project_spark.stats import q_moments

    got = {r.event_type: r for r in q_moments(spark, sf_dir).collect()}
    ref = {
        r.event_type: r
        for r in read_parquet_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.skewness("value").alias("sk"),
            F.kurtosis("value").alias("ku"),
        )
        .collect()
    }
    for et, r in got.items():
        assert abs(r.skewness - ref[et].sk) < 1e-3
        assert abs(r.excess_kurtosis - ref[et].ku) < 1e-3


def test_target_encoding_excludes_own_row(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table
    from end_to_end_datapipeline_project_spark.stats import q_target_encoding

    enc = q_target_encoding(spark, sf_dir)
    orders = read_parquet_table(spark, sf_dir, "orders")
    assert enc.count() == orders.count()
    # manual check on one category
    rows = enc.filter(F.col("o_orderpriority") == "1-URGENT").limit(5).collect()
    cat = orders.filter(F.col("o_orderpriority") == "1-URGENT").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("sx")
    ).collect()[0]
    prices = {
        r.o_orderkey: r.o_totalprice
        for r in orders.filter(F.col("o_orderpriority") == "1-URGENT").collect()
    }
    for r in rows:
        expect = (cat.sx - prices[r.o_orderkey]) / (cat.n - 1)
        assert abs(r.loo_target_enc - expect) < 1e-4


def test_naive_bayes_confusion_matrix_is_complete(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.llm_ops.text import q_naive_bayes
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table

    rows = q_naive_bayes(spark, sf_dir).collect()
    n_docs = (
        read_parquet_table(spark, sf_dir, "documents")
        .filter(F.trim("text") != "")
        .count()
    )
    assert sum(r.n_docs for r in rows) == n_docs
    # self-trained NB must beat the 1/k random baseline on its train set
    diag = sum(r.n_docs for r in rows if r.true_source == r.pred_source)
    k = len({r.true_source for r in rows})
    assert diag / n_docs > 1.0 / k


def test_info_gain_bounded_by_target_entropy(spark, sf_dir):
    import math

    from end_to_end_datapipeline_project_spark.sources import read_parquet_table
    from end_to_end_datapipeline_project_spark.stats import q_info_gain

    rows = {r.feature: r.info_gain for r in q_info_gain(spark, sf_dir).collect()}
    assert set(rows) == {"priority", "month", "price_bucket"}
    counts = [
        r.n
        for r in read_parquet_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    total = sum(counts)
    h_target = -sum((c / total) * math.log(c / total) for c in counts)
    for ig in rows.values():
        assert -1e-4 <= ig <= h_target + 1e-4


def test_item_cosine_scores_valid(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.graph import q_item_cosine

    rows = q_item_cosine(spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    for r in rows:
        assert r.part_a < r.part_b
        assert r.n_co >= 2
        assert 0.0 < r.cosine <= 1.0
    # descending by cosine (with total-order tiebreak)
    keys = [(-r.cosine, r.part_a, r.part_b) for r in rows]
    assert keys == sorted(keys)


def test_dp_histogram_noise_is_bounded_and_deterministic(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table
    from end_to_end_datapipeline_project_spark.stats import q_dp_histogram

    got = {
        r.o_orderpriority: r.noisy_count
        for r in q_dp_histogram(spark, sf_dir).collect()
    }
    again = {
        r.o_orderpriority: r.noisy_count
        for r in q_dp_histogram(spark, sf_dir).collect()
    }
    assert got == again  # hash-derived noise: reproducible
    true = {
        r.o_orderpriority: r.n
        for r in read_parquet_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for k, v in got.items():
        # Laplace(b=1) tail: |noise| > 20 has probability ~2e-9
        assert abs(v - true[k]) < 20
        assert v != true[k]


def test_k_anonymity_audit_consistency(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table
    from end_to_end_datapipeline_project_spark.stats import q_k_anonymity

    [row] = q_k_anonymity(spark, sf_dir).collect()
    cust = read_parquet_table(spark, sf_dir, "customer")
    assert row.n_rows == cust.count()
    assert (
        row.n_classes
        == cust.select("c_nationkey", "c_mktsegment").distinct().count()
    )
    assert 0 <= row.violating_classes <= row.n_classes
    # each violating class holds at most k-1 rows (that is what makes it
    # violating); bound holds vacuously at 0 violations
    assert row.rows_to_suppress <= row.violating_classes * (row.k - 1)
    assert row.k_min >= 1


def test_abtest_consistent_with_group_stats(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table
    from end_to_end_datapipeline_project_spark.stats import q_abtest

    [row] = q_abtest(spark, sf_dir).collect()
    ev = read_parquet_table(spark, sf_dir, "events")
    stats = {
        r.event_type: r
        for r in ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
        .collect()
    }
    p, c = stats["purchase"], stats["click"]
    assert row.n1 == p.n and row.n2 == c.n
    assert abs(row.mean_diff - (p.m - c.m)) < 1e-4
    import math

    se = math.sqrt(p.v / p.n + c.v / c.n)
    assert abs(row.t_stat - (p.m - c.m) / se) < 1e-3
    assert min(p.n, c.n) - 1 <= row.welch_df <= p.n + c.n - 2


def test_benford_probabilities_form_distribution(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.stats import q_benford

    rows = q_benford(spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed_p for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.benford_p for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r.chi2_term >= 0


def test_weighted_median_between_min_and_max(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table
    from end_to_end_datapipeline_project_spark.stats import q_weighted_median

    got = {r.l_returnflag: r for r in q_weighted_median(spark, sf_dir).collect()}
    li = read_parquet_table(spark, sf_dir, "lineitem")
    bounds = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.sum("l_quantity").alias("w"),
        )
        .collect()
    }
    for flag, r in got.items():
        b = bounds[flag]
        assert b.lo <= r.weighted_median <= b.hi
        assert r.total_weight == float(b.w)
        # quantity weights are mild, so the weighted median should sit
        # within 20% of the unweighted one
        assert abs(r.weighted_median - b.p50) / b.p50 < 0.2


def test_python_datasource_partitioned_read(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.udx import (
        _PYDS_N,
        q_python_datasource,
    )

    rows = q_python_datasource(spark, sf_dir).collect()
    assert sum(r.n for r in rows) == _PYDS_N
    # quadratic residues mod 97: (97+1)/2 = 49 distinct values
    assert len(rows) == 49
    # re-running with the source already registered must not fail
    again = q_python_datasource(spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_mannwhitney_u_in_valid_range(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.stats import q_mannwhitney

    df = q_mannwhitney(spark, sf_dir)
    # plan gate: the histogram-rank window must be PARTITIONED by
    # bucket — a bare Window [value ASC] (empty partition spec) would
    # be the single-partition global sort this path exists to avoid
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(bucket" in plan
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition(value" in line:
            raise AssertionError(f"unpartitioned window in plan: {line}")
    [row] = df.collect()
    assert 0 <= row.u_stat <= row.n1 * row.n2
    # same populations => no extreme effect
    assert abs(row.z_score) < 10


def test_gini_bounded_zero_one(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.stats import q_gini

    rows = q_gini(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        assert r.n_orders > 0


def test_approx_percentile_within_rank_error_of_exact(spark, sf_dir):
    """The documented 100 TB path for q_quantiles is approx_percentile
    (mergeable GK sketch); prove its rank error stays within the accuracy
    bound against the exact oracle form."""
    from end_to_end_datapipeline_project_spark.sources import read_parquet_table

    li = read_parquet_table(spark, sf_dir, "lineitem")
    acc = 1000  # rank error <= n / acc
    [row] = li.agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), "
            f"{acc})"
        ).alias("ap"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    vals = sorted(r.l_extendedprice for r in li.select("l_extendedprice").collect())
    n = row.n
    for q, approx in zip((0.5, 0.9, 0.99), row.ap):
        # rank of the approximate answer must be within n/acc of target
        import bisect

        rank = bisect.bisect_left(vals, approx)
        assert abs(rank - q * n) <= n / acc + 1


def test_classifier_metrics_consistent_with_confusion_matrix(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.llm_ops.text import (
        q_classifier_metrics,
        q_naive_bayes,
    )

    rows = {r["class"]: r for r in q_classifier_metrics(spark, sf_dir).collect()}
    cm = q_naive_bayes(spark, sf_dir).collect()
    n_docs = sum(r.n_docs for r in cm)
    assert sum(r.n_true for r in rows.values()) == n_docs
    assert sum(r.n_pred for r in rows.values()) == n_docs
    for r in rows.values():
        assert 0.0 <= r.precision <= 1.0
        assert 0.0 <= r.recall <= 1.0
        assert min(r.precision, r.recall) - 1e-6 <= r.f1 <= max(
            r.precision, r.recall
        ) + 1e-6

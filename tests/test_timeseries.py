"""Semantics of the time-series operators (as-of join, binned range join,
forward-fill) and the stats/salting module, on micro-DataFrames where the
expected answer is hand-computable."""

from pyspark.sql import functions as F

from end_to_end_datapipeline_project_spark.timeseries import (
    q_asof_join,
    q_gap_fill,
    q_range_join,
)
from end_to_end_datapipeline_project_spark.stats import q_salted_join, q_stats


def _stage_tables(spark, tmp_path, **tables):
    """Write micro-tables as parquet so the q_* entry points (which read
    from an sf_dir) run on controlled data."""
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(f"{tmp_path}/{name}.parquet")
    return str(tmp_path)


def _li(spark, rows):
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate string",
    )
    return df.withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))


def test_asof_join_picks_most_recent_quote_at_or_before(spark, tmp_path):
    # part 1: quotes (linenumber=1) at day 1 (price 10) and day 5 (price 50);
    # trades (returnflag=R) at day 3 → 10, day 5 → 50 (>= semantics),
    # day 0 → no prior quote → NULL
    rows = [
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", "2020-01-01 00:00:00"),
        (2, 1, 1, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", "2020-01-05 00:00:00"),
        (3, 1, 1, 2, 7.0, 99.0, 0.0, 0.0, "R", "O", "2020-01-03 00:00:00"),
        (4, 1, 1, 2, 8.0, 99.0, 0.0, 0.0, "R", "O", "2020-01-05 00:00:00"),
        (5, 1, 1, 2, 9.0, 99.0, 0.0, 0.0, "R", "O", "2019-12-25 00:00:00"),
    ]
    sf = _stage_tables(spark, tmp_path, lineitem=_li(spark, rows))
    got = {r.l_orderkey: r.asof_price for r in q_asof_join(spark, sf).collect()}
    assert got == {3: 10.0, 4: 50.0, 5: None}


def test_asof_join_tie_on_quote_ts_takes_max_orderkey(spark, tmp_path):
    # two quotes same (part, ts) — survivor must be the max-orderkey one
    rows = [
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", "2020-01-01 00:00:00"),
        (6, 1, 1, 1, 1.0, 60.0, 0.0, 0.0, "N", "O", "2020-01-01 00:00:00"),
        (3, 1, 1, 2, 7.0, 99.0, 0.0, 0.0, "R", "O", "2020-01-02 00:00:00"),
    ]
    sf = _stage_tables(spark, tmp_path, lineitem=_li(spark, rows))
    [row] = q_asof_join(spark, sf).collect()
    assert row.asof_price == 60.0


def test_range_join_counts_points_in_half_open_interval(spark, tmp_path):
    orders = spark.createDataFrame(
        [(1, 10, "O", 1.0, "2020-01-10 00:00:00", "1-URGENT"),
         (2, 11, "O", 1.0, "2020-06-01 00:00:00", "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    # in-window: day 10, 11, 12 (x2); out: day 13 (half-open) and day 9
    li = _li(
        spark,
        [
            (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2020-01-10 00:00:00"),
            (1, 1, 1, 2, 2.0, 1.0, 0.0, 0.0, "N", "O", "2020-01-11 12:00:00"),
            (1, 1, 1, 3, 4.0, 1.0, 0.0, 0.0, "N", "O", "2020-01-12 23:59:59"),
            (1, 1, 1, 4, 8.0, 1.0, 0.0, 0.0, "N", "O", "2020-01-13 00:00:00"),
            (1, 1, 1, 5, 16.0, 1.0, 0.0, 0.0, "N", "O", "2020-01-09 23:59:59"),
        ],
    )
    sf = _stage_tables(spark, tmp_path, orders=orders, lineitem=li)
    rows = q_range_join(spark, sf).collect()
    assert len(rows) == 1  # the 5-LOW order is filtered out; no match rows
    assert rows[0].o_orderkey == 1
    assert rows[0].n_shipped == 3
    assert rows[0].sum_qty == 7.0


def test_gap_fill_carries_last_purchase_per_user(spark, tmp_path):
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 7, "view", 1.0, "{}"),
            (2, "2024-01-01 11:00:00", 7, "purchase", 42.0, "{}"),
            (3, "2024-01-01 12:00:00", 7, "view", 2.0, "{}"),
            (4, "2024-01-01 13:00:00", 7, "purchase", 10.0, "{}"),
            (5, "2024-01-01 14:00:00", 7, "error", 3.0, "{}"),
            (6, "2024-01-01 09:00:00", 8, "view", 4.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sf = _stage_tables(spark, tmp_path, events=ev)
    got = {r.event_id: r.last_purchase_value for r in q_gap_fill(spark, sf).collect()}
    assert got == {1: None, 2: 42.0, 3: 42.0, 4: 10.0, 5: 10.0, 6: None}


def test_salted_join_matches_plain_join(spark, tmp_path):
    ev = spark.createDataFrame(
        [(i, "2024-01-01 10:00:00", i % 3, "click", float(i), "{}")
         for i in range(30)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    orders = spark.createDataFrame(
        [(1, 0, "O", 1.0, "2020-01-01 00:00:00", "1-URGENT"),
         (2, 1, "O", 1.0, "2020-01-01 00:00:00", "2-HIGH"),
         (3, 2, "O", 1.0, "2020-01-01 00:00:00", "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    sf = _stage_tables(spark, tmp_path, events=ev, orders=orders)
    got = {
        (r.event_type, r.o_orderpriority): (r.n_pairs, r.sum_value)
        for r in q_salted_join(spark, sf).collect()
    }
    # users 0 and 1 keep their 10 events each; user 2 (5-LOW) drops out
    assert got[("click", "1-URGENT")] == (10, float(sum(range(0, 30, 3))))
    assert got[("click", "2-HIGH")] == (10, float(sum(range(1, 30, 3))))
    assert len(got) == 2


def test_salted_join_hot_key_path_matches_plain_join(spark, tmp_path):
    from end_to_end_datapipeline_project_spark.stats import SALT_HOT_MIN

    # user 0 crosses the heavy-hitter threshold -> actually salted;
    # user 1 stays cold -> joins unsalted with salt 0
    n_hot = SALT_HOT_MIN + 50
    rows = [
        (i, "2024-01-01 10:00:00", 0, "click", 1.0, "{}")
        for i in range(n_hot)
    ] + [
        (n_hot + i, "2024-01-01 10:00:00", 1, "view", 2.0, "{}")
        for i in range(5)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    orders = spark.createDataFrame(
        [(1, 0, "O", 1.0, "2020-01-01 00:00:00", "1-URGENT"),
         (2, 1, "O", 1.0, "2020-01-01 00:00:00", "2-HIGH")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    sf = _stage_tables(spark, tmp_path, events=ev, orders=orders)
    got = {
        (r.event_type, r.o_orderpriority): (r.n_pairs, r.sum_value)
        for r in q_salted_join(spark, sf).collect()
    }
    assert got[("click", "1-URGENT")] == (n_hot, float(n_hot))
    assert got[("view", "2-HIGH")] == (5, 10.0)
    assert len(got) == 2


def test_stats_moments_match_closed_form(spark, tmp_path):
    # value = [1,2,3] for one event_type → mean 2, var 1, stddev 1
    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
         (2, "2024-01-01 11:00:00", 2, "click", 2.0, "{}"),
         (3, "2024-01-01 12:00:00", 3, "click", 3.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sf = _stage_tables(spark, tmp_path, events=ev)
    [r] = q_stats(spark, sf).collect()
    assert (r.n, r.mean_value, r.var_value, r.stddev_value) == (3, 2.0, 1.0, 1.0)
    # value and user_id are perfectly correlated here
    assert r.corr_value_user == 1.0


def test_ohlc_bars_invariants(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.registry import all_queries

    rows = all_queries()["q_ohlc_bars"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n_ticks >= 1
        if r.n_ticks == 1:
            assert r.open == r.close == r.high == r.low


def test_rolling_median_is_bounded_by_window_extremes(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.registry import all_queries

    rows = all_queries()["q_rolling_median"](spark, sf_dir).collect()
    assert rows
    by_user = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        hist = by_user.setdefault(r.user_id, [])
        hist.append(r.value)
        frame = hist[-5:]
        assert min(frame) - 1e-6 <= r.med5 <= max(frame) + 1e-6


def test_ewma_equals_pandas_reference(spark, sf_dir):
    """Truncated span-10 EWMA matches a hand-rolled per-user reference."""
    from end_to_end_datapipeline_project_spark.registry import all_queries
    from end_to_end_datapipeline_project_spark.timeseries import _EWMA_DECAY, _EWMA_SPAN

    rows = all_queries()["q_ewma"](spark, sf_dir).collect()
    assert rows
    by_user = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        hist = by_user.setdefault(r.user_id, [])
        hist.append(r.value)
        window = hist[-_EWMA_SPAN:][::-1]  # most recent first
        num = sum(_EWMA_DECAY**k * v for k, v in enumerate(window))
        den = sum(_EWMA_DECAY**k for k in range(len(window)))
        assert abs(r.ewma10 - num / den) < 1e-5

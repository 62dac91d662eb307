"""Time-series operators Spark lacks as built-ins: as-of join, range
(interval) join, forward-fill.  Each is a *composition of shuffles Spark
already has* — no UDFs, no cross products — so they keep working at
100 TB where the naive formulations (theta-join / BroadcastNestedLoop)
explode quadratically.

- **As-of join** (`q_asof_join`): the "join each trade to the most recent
  quote at-or-before it" operator (reference has no joins at all,
  SURVEY.md §2.4; this is the canonical time-series extension).
  Implementation: tag both relations, UNION them, and take
  ``last(value, ignorenulls) OVER (PARTITION BY key ORDER BY t, src,
  tiebreak ROWS UNBOUNDED PRECEDING)``.  One hash shuffle on the key +
  one in-partition sort — same cost as a single window, regardless of
  how many right-side rows precede each left row.  The DuckDB oracle is
  a *native* ``ASOF LEFT JOIN``, proving the composition implements real
  as-of semantics.
- **Range join** (`q_range_join`): pure interval containment with **no**
  equi-key.  Naive Spark = BroadcastNestedLoopJoin, O(|L|·|R|).  We bin
  time into fixed-width buckets, explode each interval to the buckets it
  covers (bounded: interval span / bucket width), and equi-join on the
  bucket before the exact BETWEEN filter — turning the theta join into a
  shuffled hash join whose fan-out is the per-bucket density, the
  standard trick (also what Databricks' range-join hints do under the
  hood).
- **Forward-fill** (`q_gap_fill`): carry the last non-null observation
  per key — ``last(ignorenulls)`` over an unbounded-preceding frame; the
  oracle is DuckDB's ``last_value(x IGNORE NULLS)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import dsum, register, spark_dsum, spark_dsum_fast
from .sources import read_parquet_table


# --- as-of join -----------------------------------------------------------

#: "quotes" = one price observation per (part, day): the l_linenumber=1
#: lineitems, deduped to the max-orderkey row per (part, shipdate) so the
#: as-of match is deterministic under ties.
QUOTES_SQL = """
  __quotes AS (
    SELECT l_partkey AS q_partkey, l_shipdate AS q_ts,
           max_by(l_extendedprice, l_orderkey) AS q_price
    FROM lineitem
    WHERE l_linenumber = 1
    GROUP BY l_partkey, l_shipdate
  ),
  __trades AS (
    SELECT l_orderkey, l_linenumber, l_partkey, l_shipdate, l_quantity
    FROM lineitem
    WHERE l_returnflag = 'R'
  )
"""


@register(
    "q_asof_join",
    f"""
  WITH {QUOTES_SQL}
  SELECT t.l_orderkey, t.l_linenumber, t.l_partkey, t.l_shipdate,
         t.l_quantity, round(q.q_price, 6) AS asof_price
  FROM __trades t
  ASOF LEFT JOIN __quotes q
    ON t.l_partkey = q.q_partkey AND t.l_shipdate >= q.q_ts
""",
    doc="As-of join: each returned lineitem ('trade') matched to the most "
    "recent linenumber-1 price observation ('quote') for the same part at "
    "or before its shipdate. Spark: union + last(ignorenulls) window — "
    "ONE shuffle; oracle: DuckDB native ASOF LEFT JOIN.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_parquet_table(spark, sf_dir, "lineitem")
    quotes = (
        li.filter(F.col("l_linenumber") == 1)
        .groupBy(
            F.col("l_partkey").alias("key"), F.col("l_shipdate").alias("t")
        )
        .agg(F.max_by("l_extendedprice", "l_orderkey").alias("q_price"))
        .withColumn("src", F.lit(0))
        .withColumn("l_orderkey", F.lit(None).cast("long"))
        .withColumn("l_linenumber", F.lit(None).cast("int"))
        .withColumn("l_quantity", F.lit(None).cast("double"))
    )
    trades = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_partkey").alias("key"),
        F.col("l_shipdate").alias("t"),
        F.lit(None).cast("double").alias("q_price"),
        F.lit(1).alias("src"),
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
    )
    tagged = quotes.select(*trades.columns).unionByName(trades)
    # quotes sort before trades at equal t (src 0 < 1), so a quote AT the
    # trade's timestamp is visible — DuckDB ASOF's >= semantics.
    w = (
        Window.partitionBy("key")
        .orderBy(F.asc("t"), F.asc("src"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        tagged.withColumn("asof_price", F.last("q_price", ignorenulls=True).over(w))
        .filter(F.col("src") == 1)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("key").alias("l_partkey"),
            F.col("t").alias("l_shipdate"),
            "l_quantity",
            F.round("asof_price", 6).alias("asof_price"),
        )
    )


# --- range join -----------------------------------------------------------

RANGE_DAYS = 3  # interval width: [o_orderdate, o_orderdate + 3 days)
BIN = 86400  # 1-day buckets — bound the explode fan-out to RANGE_DAYS


@register(
    "q_range_join",
    f"""
  SELECT i.o_orderkey,
         count(*) AS n_shipped,
         {dsum("p.l_quantity")} AS sum_qty
  FROM (SELECT o_orderkey, o_orderdate FROM orders
        WHERE o_orderpriority = '1-URGENT') i
  JOIN lineitem p
    ON p.l_shipdate >= i.o_orderdate
   AND p.l_shipdate < i.o_orderdate + INTERVAL {RANGE_DAYS} DAY
  GROUP BY i.o_orderkey
""",
    doc="Pure range (interval-containment) join with NO equi-key: lineitems "
    "shipped within 3 days of each urgent order's date. Spark: bin "
    "timestamps into 1-day buckets, explode each interval to its ≤4 "
    "covered buckets, equi-join on bucket, then exact BETWEEN — a "
    "shuffled hash join instead of a nested-loop cross product.",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_parquet_table(spark, sf_dir, "orders")
    li = read_parquet_table(spark, sf_dir, "lineitem")
    ivals = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate")
        .withColumn("lo", F.unix_timestamp("o_orderdate"))
        .withColumn("hi", F.col("lo") + RANGE_DAYS * 86400)
        # bins the half-open [lo, hi) touches, split into FULL bins
        # (bin ⊆ interval — every point in the bin matches, no per-point
        # test needed) and EDGE bins (partially covered at either end)
        .withColumn("lo_bin", (F.col("lo") / BIN).cast("long"))
        .withColumn("hi_bin", ((F.col("hi") - 1) / BIN).cast("long"))
        .withColumn("full_lo", ((F.col("lo") + BIN - 1) / BIN).cast("long"))
        .withColumn("full_hi", (F.col("hi") / BIN).cast("long") - 1)
    )
    pts = li.select("l_quantity", "l_shipdate").withColumn(
        "pt", F.unix_timestamp("l_shipdate")
    ).withColumn("bin", (F.col("pt") / BIN).cast("long"))

    # FULL bins: pre-aggregate the points per bin FIRST, then join the
    # compact per-bin partials — the pair-level fan-out (Σ intervals×points
    # per bin, the thing that exploded the naive plan) never materializes.
    per_bin = pts.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("q"),
    )
    full = (
        ivals.filter(F.col("full_hi") >= F.col("full_lo"))
        .withColumn("bin", F.explode(F.sequence("full_lo", "full_hi")))
        .join(per_bin, "bin")
        .select("o_orderkey", "n", "q")
    )
    # EDGE bins: only partially-covered bins take the exact per-point
    # test; with day-aligned interval endpoints this side is empty, and in
    # general it is bounded by 2 bins per interval.
    edges = ivals.select(
        "o_orderkey", "lo", "hi", F.col("lo_bin").alias("bin")
    ).filter(F.col("lo_bin") < F.col("full_lo")).unionAll(
        ivals.select(
            "o_orderkey", "lo", "hi", F.col("hi_bin").alias("bin")
        ).filter(
            (F.col("hi_bin") > F.col("full_hi"))
            # suppress only when the LO edge already emitted this same
            # bin: the old `hi_bin > lo_bin` guard also dropped
            # intervals contained in one bin with a bin-aligned lo
            # (lo-edge skipped, full side empty), losing their matches
            # under BIN > interval retuning
            & ~(
                (F.col("hi_bin") == F.col("lo_bin"))
                & (F.col("lo_bin") < F.col("full_lo"))
            )
        )
    )
    edge = (
        edges.join(pts, "bin")
        .filter((F.col("pt") >= F.col("lo")) & (F.col("pt") < F.col("hi")))
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("q"),
        )
    )
    return (
        full.unionByName(edge)
        .groupBy("o_orderkey")
        .agg(
            F.sum("n").alias("n_shipped"),
            F.sum("q").cast("double").alias("sum_qty"),
        )
    )


# --- forward fill ---------------------------------------------------------


@register(
    "q_gap_fill",
    """
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'purchase' THEN value END
                    IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_purchase_value
  FROM events
""",
    doc="Forward-fill (LOCF): carry each user's most recent purchase value "
    "onto every subsequent event — last(ignorenulls) over an unbounded-"
    "preceding frame; NULL before the first purchase.",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_parquet_table(spark, sf_dir, "events")
    # (ts, event_id) tiebreak: same-timestamp peers would otherwise see
    # the frame in arbitrary (engine-dependent) order
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    return df.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(sparse, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@register(
    "q_interpolate",
    """
  WITH __dedup AS (
    SELECT user_id, ts, value FROM (
      SELECT user_id, ts, value, row_number() OVER (
        PARTITION BY user_id, ts ORDER BY event_id) AS __rn
      FROM events) WHERE __rn = 1
  ),
  __grid AS (
    SELECT user_id,
           unnest(generate_series(CAST(date_trunc('day', min(ts)) AS TIMESTAMP),
                                  CAST(date_trunc('day', max(ts)) AS TIMESTAMP),
                                  INTERVAL 1 DAY)) AS ts
    FROM __dedup GROUP BY user_id
  ),
  __u AS (
    SELECT user_id, ts, value, 'e' AS kind FROM __dedup
    UNION ALL
    SELECT user_id, ts, NULL AS value, 'g' AS kind FROM __grid
  ),
  __ctx AS (
    SELECT user_id, ts, value, kind,
           last_value(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, kind
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
           last_value(CASE WHEN value IS NOT NULL
                           THEN CAST(floor(epoch(ts)) AS BIGINT) END
                      IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, kind
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
           first_value(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, kind
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_val,
           first_value(CASE WHEN value IS NOT NULL
                            THEN CAST(floor(epoch(ts)) AS BIGINT) END
                       IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, kind
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_ts
    FROM __u
  )
  SELECT user_id, ts AS grid_ts,
         round(CASE
           WHEN prev_val IS NULL THEN next_val
           WHEN next_val IS NULL THEN prev_val
           WHEN next_ts = prev_ts THEN prev_val
           ELSE prev_val + (next_val - prev_val)
                * (CAST(floor(epoch(ts)) AS BIGINT) - prev_ts)
                / (next_ts - prev_ts)
         END, 6) AS value_interp
  FROM __ctx WHERE kind = 'g'
""",
    doc="Resample-and-interpolate: per key, a daily grid spanning the "
    "key's observed range, each grid point valued by LINEAR "
    "interpolation between the surrounding observations (edge points "
    "fall back to nearest). Implementation = union grid+events, then "
    "last/first IGNORE NULLS windows — ONE shuffle on the key, two "
    "in-partition window passes, no join of events to grid. The "
    "interpolation fraction uses whole-second integer timestamps so "
    "both engines divide identical values. Complements q_gap_fill "
    "(LOCF) with the smooth resampler every telemetry/feature "
    "pipeline needs.",
)
def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    wdd = Window.partitionBy("user_id", "ts").orderBy("event_id")
    dedup = (
        ev.withColumn("__rn", F.row_number().over(wdd))
        .filter(F.col("__rn") == 1)
        .select("user_id", "ts", "value")
    )
    grid = (
        dedup.groupBy("user_id")
        .agg(
            F.date_trunc("day", F.min("ts")).alias("t0"),
            F.date_trunc("day", F.max("ts")).alias("t1"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("t0", "t1", F.expr("INTERVAL 1 DAY"))
            ).alias("ts"),
        )
    )
    u = dedup.withColumn("kind", F.lit("e")).unionByName(
        grid.select(
            "user_id",
            "ts",
            F.lit(None).cast("double").alias("value"),
            F.lit("g").alias("kind"),
        )
    )
    secs = F.unix_timestamp("ts")
    ev_secs = F.when(F.col("value").isNotNull(), secs)
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    ctx = u.select(
        "user_id",
        "ts",
        "kind",
        F.last("value", ignorenulls=True).over(wb).alias("prev_val"),
        F.last(ev_secs, ignorenulls=True).over(wb).alias("prev_ts"),
        F.first("value", ignorenulls=True).over(wf).alias("next_val"),
        F.first(ev_secs, ignorenulls=True).over(wf).alias("next_ts"),
    )
    pv, nv = F.col("prev_val"), F.col("next_val")
    pt, nt = F.col("prev_ts"), F.col("next_ts")
    interp = (
        F.when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .when(nt == pt, pv)
        .otherwise(pv + (nv - pv) * (secs - pt) / (nt - pt))
    )
    return ctx.filter(F.col("kind") == "g").select(
        "user_id",
        F.col("ts").alias("grid_ts"),
        F.round(interp, 6).alias("value_interp"),
    )


# --- trailing-window z-score anomaly detection ---------------------------


@register(
    "q_zscore_anomaly",
    """
  WITH stats AS (
    SELECT user_id, event_id, ts, value,
           count(value) OVER w AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE) AS s1,
           CAST(SUM(CAST(value * value AS DECIMAL(30,6))) OVER w AS DOUBLE)
             AS s2
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
  ),
  z AS (
    SELECT user_id, event_id, value,
           round((value - s1 / n)
                 / nullif(sqrt(greatest(s2 / n - (s1 / n) * (s1 / n),
                                        0.0)), 0.0), 6) AS zscore
    FROM stats
    WHERE n >= 20
  )
  SELECT user_id, event_id, value, zscore
  FROM z
  WHERE abs(zscore) > 2.0
""",
    doc="Trailing-window z-score anomaly detection: per-user mean/std "
    "over the last 20 events from decimal-exact power sums (one "
    "shuffle on user_id + an in-partition sort — identical cost to "
    "any other window), flagging |z| > 2. Power-sum formulation keeps "
    "the result independent of partial-aggregation order, which is "
    "what makes the flags reproducible on a 1000-executor run.",
)
def q_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    # count(value), not count(*): NULL values are absent from s1/s2, so
    # counting their rows would treat them as zero-valued observations,
    # biasing mean/std (and the >= 20 gate must count real observations)
    n = F.count(F.col("value")).over(w)
    s1 = F.sum(F.col("value").cast("decimal(30,6)")).over(w).cast("double")
    s2 = (
        F.sum((F.col("value") * F.col("value")).cast("decimal(30,6)"))
        .over(w)
        .cast("double")
    )
    stats = ev.select(
        "user_id",
        "event_id",
        "value",
        n.alias("n"),
        s1.alias("s1"),
        s2.alias("s2"),
    ).filter(F.col("n") >= 20)
    mean = F.col("s1") / F.col("n")
    var = F.greatest(F.col("s2") / F.col("n") - mean * mean, F.lit(0.0))
    z = F.round((F.col("value") - mean) / F.nullif(F.sqrt(var), F.lit(0.0)), 6)
    return (
        stats.withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > 2.0)
        .select("user_id", "event_id", "value", "zscore")
    )


# --- day-of-week seasonality profile --------------------------------------


@register(
    "q_seasonality",
    f"""
  WITH per_cell AS (
    SELECT isodow(ts) - 1 AS dow, event_type,
           count(value) AS n,
           {dsum("value")} / count(value) AS avg_value
    FROM events
    GROUP BY isodow(ts) - 1, event_type
  ),
  with_base AS (
    SELECT dow, event_type, n, avg_value,
           CAST(sum(CAST(n * avg_value AS DECIMAL(30,6)))
                  OVER (PARTITION BY event_type) AS DOUBLE)
             / sum(n) OVER (PARTITION BY event_type) AS base
    FROM per_cell
  )
  SELECT dow, event_type, n,
         round(avg_value, 6) AS avg_value,
         round(avg_value / base, 6) AS seasonal_index
  FROM with_base
""",
    doc="Day-of-week seasonality profile: per-(weekday, type) mean value "
    "vs the type's overall mean (recovered exactly from the reduced "
    "per-cell table via window aggregates — the raw table is scanned "
    "once). seasonal_index > 1 = hot weekday. Weekday = Monday 0, "
    "pinned UTC on both engines.",
)
def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    per_cell = (
        # n = count(value): NULL values are absent from the sum, so a
        # row count would bias avg_value (and therefore seasonal_index)
        # wherever null density differs by cell; n doubles as the base
        # weight below, keeping base = the true mean of observed values
        ev.groupBy(
            F.weekday("ts").alias("dow"), F.col("event_type")
        ).agg(
            F.count(F.col("value")).alias("n"),
            # events.value is a 2-decimal exact ≤ ~560 — fast contract
            (spark_dsum_fast(F.col("value"), 2) / F.count(F.col("value"))).alias(
                "avg_value"
            ),
        )
    )
    w = Window.partitionBy("event_type")
    # decimal-quantized window sum: a plain double reduction is summed
    # in engine-specific order and a last-ulp drift in base can flip
    # round(avg/base, 6) at a half-way boundary
    base = (
        F.sum((F.col("n") * F.col("avg_value")).cast("decimal(30,6)"))
        .over(w)
        .cast("double")
        / F.sum("n").over(w)
    )
    return per_cell.select(
        "dow",
        "event_type",
        "n",
        F.round("avg_value", 6).alias("avg_value"),
        F.round(F.col("avg_value") / base, 6).alias("seasonal_index"),
    )


# --- last-touch attribution (as-of with tolerance) ------------------------


@register(
    "q_attribution",
    """
  WITH clicks AS (
    SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'click'
  ),
  purch AS (
    SELECT event_id, user_id, ts, value
    FROM events WHERE event_type = 'purchase'
  )
  SELECT p.event_id, p.user_id,
         p.ts AS purchase_ts,
         c.ts AS last_click_ts,
         CASE WHEN c.ts IS NOT NULL
                   AND c.ts >= p.ts - INTERVAL 1 DAY
              THEN 1 ELSE 0 END AS attributed,
         p.value
  FROM purch p
  ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    doc="Last-touch marketing attribution: each purchase is matched to "
    "the user's most recent click at-or-before it (an as-of join), "
    "attributed only when inside a 1-day window. Spark composes it as "
    "the tagged-union + last(ignorenulls) window — one shuffle on "
    "user_id regardless of history depth; the oracle is DuckDB's "
    "native ASOF LEFT JOIN plus the tolerance predicate. Clicks are "
    "deduped per (user, ts) so ties cannot make the match ambiguous.",
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("t"))
        .distinct()
        .select(
            "user_id",
            "t",
            F.col("t").alias("click_ts"),
            F.lit(0).alias("src"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(1).alias("src"),
        "event_id",
        "value",
    )
    tagged = clicks.unionByName(purch)
    # clicks sort before purchases at equal t (src 0 < 1): a click AT the
    # purchase instant is visible, matching ASOF's >= semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_click = tagged.withColumn(
        "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    attributed = F.when(
        F.col("last_click_ts").isNotNull()
        & (
            F.col("last_click_ts")
            >= F.col("t") - F.expr("INTERVAL 1 DAY")
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    return with_click.filter(F.col("src") == 1).select(
        "event_id",
        "user_id",
        F.col("t").alias("purchase_ts"),
        "last_click_ts",
        attributed.alias("attributed"),
        "value",
    )


@register(
    "q_ohlc_bars",
    """
  WITH __ranked AS (
    SELECT user_id, CAST(ts AS DATE) AS bar_date, value,
           row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                              ORDER BY ts, event_id) AS rn_a,
           row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM events)
  SELECT user_id, bar_date,
         max(CASE WHEN rn_a = 1 THEN value END) AS open,
         max(value) AS high,
         min(value) AS low,
         max(CASE WHEN rn_d = 1 THEN value END) AS close,
         count(*) AS n_ticks
  FROM __ranked
  GROUP BY user_id, bar_date
""",
    doc="OHLC downsampling: per (user, day) candlestick bars — open/close "
    "are the first/last tick by (ts, event_id) so survivors are "
    "deterministic under timestamp ties, high/low/count are plain "
    "order-independent aggregates. One (user, day) shuffle shared by "
    "the two rank windows and the final hash agg; at 100 TB this is "
    "the standard trade-bar rollup and partitions by day for pruning.",
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    bar = ev.withColumn("bar_date", F.to_date("ts"))
    wa = Window.partitionBy("user_id", "bar_date").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "bar_date").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        bar.withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
        .groupBy("user_id", "bar_date")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


@register(
    "q_rolling_median",
    """
  SELECT event_id, user_id, ts, value,
         round(median(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5
  FROM events
  WHERE event_type = 'purchase'
""",
    doc="Trailing 5-row exact median per user (robust smoother): Spark "
    "evaluates the exact `percentile(value, 0.5)` aggregate over the "
    "rows frame — both engines linearly interpolate the middle pair on "
    "even counts; rounded to 6 to absorb last-ulp interpolation "
    "differences. One user-keyed shuffle + in-partition sort; the "
    "bounded frame keeps per-row work O(frame), skew-safe at scale.",
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias("med5"),
    )


_EWMA_SPAN = 10
_EWMA_DECAY = 1.0 - 2.0 / (_EWMA_SPAN + 1)  # (1 - alpha), alpha = 2/(span+1)


def _ewma_sql() -> str:
    # identical double literals on both engines => identical arithmetic
    lags = ",\n           ".join(
        f"lag(value, {k}) OVER (PARTITION BY user_id "
        f"ORDER BY ts, event_id) AS v{k}"
        for k in range(1, _EWMA_SPAN)
    )
    num = " + ".join(
        f"{_EWMA_DECAY ** k!r} * coalesce(v{k}, 0.0)"
        for k in range(_EWMA_SPAN)
    )
    den = " + ".join(
        f"{_EWMA_DECAY ** k!r} * (CASE WHEN v{k} IS NOT NULL THEN 1.0 ELSE 0.0 END)"
        for k in range(_EWMA_SPAN)
    )
    return f"""
  WITH __lagged AS (
    SELECT event_id, user_id, ts, value, value AS v0,
           {lags}
    FROM events
    WHERE event_type = 'purchase')
  SELECT event_id, user_id, ts, value,
         round(({num}) / nullif({den}, 0.0), 6) AS ewma10
  FROM __lagged
"""


@register(
    "q_ewma",
    _ewma_sql(),
    doc=f"Span-{_EWMA_SPAN} truncated EWMA per user: the recursive "
    "definition is unrolled to a fixed lag-chain (weights (1-a)^k over "
    "the last 10 observations, renormalized over the available prefix "
    "at partition starts), so it is a single window — no recursion, no "
    "self-join, one user-keyed shuffle. Weight literals are generated "
    "once and shared with the oracle so both engines run identical "
    "IEEE arithmetic; rounded to 6.",
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    df = ev.select(
        "event_id", "user_id", "ts", "value", F.col("value").alias("v0")
    )
    for k in range(1, _EWMA_SPAN):
        df = df.withColumn(f"v{k}", F.lag("value", k).over(w))
    num = None
    den = None
    for k in range(_EWMA_SPAN):
        wk = _EWMA_DECAY ** k
        nterm = F.lit(wk) * F.coalesce(F.col(f"v{k}"), F.lit(0.0))
        dterm = F.lit(wk) * F.when(
            F.col(f"v{k}").isNotNull(), F.lit(1.0)
        ).otherwise(F.lit(0.0))
        num = nterm if num is None else num + nterm
        den = dterm if den is None else den + dterm
    # nullif guards the all-NULL-window case (value is nullable by
    # contract): den = 0 would raise DIVIDE_BY_ZERO under ANSI mode
    return df.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("ewma10"),
    )


_ACF_MAX_LAG = 7


@register(
    "q_acf",
    f"""
  WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d, {dsum("o_totalprice")} AS rev
    FROM orders GROUP BY 1
  ),
  m AS (
    SELECT {dsum("rev")} / count(*) AS mu FROM daily
  ),
  lagged AS (
    SELECT rev, mu,
           {", ".join(f"lag(rev, {k}) OVER (ORDER BY d) AS l{k}" for k in range(1, _ACF_MAX_LAG + 1))}
    FROM daily CROSS JOIN m
  ),
  sums AS (
    SELECT {dsum("(rev - mu) * (rev - mu)")} AS den,
           {", ".join(f"{dsum(f'(rev - mu) * (l{k} - mu)')} AS num{k}, count(l{k}) AS n{k}" for k in range(1, _ACF_MAX_LAG + 1))}
    FROM lagged
  )
  SELECT u.lag, round(u.num / sums.den, 6) AS acf, u.n_pairs
  FROM sums, LATERAL (VALUES
    {", ".join(f"({k}, num{k}, n{k})" for k in range(1, _ACF_MAX_LAG + 1))}
  ) AS u(lag, num, n_pairs)
""",
    doc=f"Autocorrelation function of daily order revenue at lags 1.."
    f"{_ACF_MAX_LAG}: the series collapses to one row per day (hash "
    "agg), all 7 lag columns come from ONE window sort pass, and the "
    "numerators/denominator are decimal-quantized sums so both engines "
    "agree bit-for-bit. The ordered window is a single partition but "
    "over |distinct days| rows only (the fact table never sorts); at "
    "100 TB the day-series is still tiny — the pattern holds.",
)
def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_parquet_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("d")
        # totalprice is a 2-decimal exact ≤ 5e5 — fast contract; the
        # off-grid (rev−μ) products below stay decimal (|days| rows only)
    ).agg(spark_dsum_fast(F.col("o_totalprice"), 2).alias("rev"))
    mu = daily.agg(
        (spark_dsum(F.col("rev")) / F.count(F.lit(1))).alias("mu")
    )
    w = Window.orderBy("d")
    lagged = daily.crossJoin(F.broadcast(mu))
    for k in range(1, _ACF_MAX_LAG + 1):
        lagged = lagged.withColumn(f"l{k}", F.lag("rev", k).over(w))
    dev = F.col("rev") - F.col("mu")
    aggs = [spark_dsum(dev * dev).alias("den")]
    for k in range(1, _ACF_MAX_LAG + 1):
        aggs.append(
            spark_dsum(dev * (F.col(f"l{k}") - F.col("mu"))).alias(f"num{k}")
        )
        aggs.append(F.count(f"l{k}").alias(f"n{k}"))
    sums = lagged.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(k).alias("lag"),
                F.round(F.col(f"num{k}") / F.col("den"), 6).alias("acf"),
                F.col(f"n{k}").alias("n_pairs"),
            )
            for k in range(1, _ACF_MAX_LAG + 1)
        ]
    )
    return sums.select(F.explode(pairs).alias("p")).select(
        "p.lag", "p.acf", "p.n_pairs"
    )

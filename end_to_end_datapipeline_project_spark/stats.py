"""Statistical aggregates and the skew-handling (salted) shuffle pattern.

Extension surface beyond the reference (SURVEY.md §2.5: no statistics tier
there beyond avg/max, gtfsGold.py:94-102); part of the 100 TB analytics
playbook from SURVEY.md §7.2 M4.

- ``q_quantiles``: exact interpolated percentiles (Spark ``percentile`` ≡
  DuckDB ``quantile_cont``).  At 100 TB the engine's default is
  ``approx_percentile`` (GK-sketch, mergeable, one pass, no global sort);
  the exact form is the correctness oracle for it.
- ``q_stats``: second-moment statistics (stddev / variance / correlation /
  covariance).  Composed from decimal-exact power sums — n, Σx, Σx²,
  Σxy — rather than the built-in one-pass co-moment aggregates: power
  sums are associative + exact, so the result is bit-identical under any
  partial-aggregation order (1000-way parallel partial agg reorders
  float merges; the built-ins then differ run-to-run in the last ulps).
- ``q_salted_join``: the skew playbook.  A hot key in a shuffle join sends
  its entire fan-in to one reducer; salting splits each key into
  ``SALT_BUCKETS`` deterministic sub-keys on the fact side and replicates
  the dimension side ×SALT_BUCKETS (explode over a literal sequence), so
  the hot key's work spreads over SALT_BUCKETS reducers.  Two-phase
  aggregation then removes the salt.  The oracle is the *unsalted* plain
  SQL — proving salting is a pure physical rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import dsum, register, spark_dsum, spark_dsum_fast, spark_dsum_rounded
from .sources import read_parquet_table


@register(
    "q_quantiles",
    """
  SELECT l_returnflag,
         round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
         round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
         round(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
         round(min(l_extendedprice), 6) AS lo,
         round(max(l_extendedprice), 6) AS hi
  FROM lineitem
  GROUP BY l_returnflag
""",
    doc="Exact interpolated percentiles per group (Spark percentile ≡ "
    "DuckDB quantile_cont). Scale path: approx_percentile (mergeable "
    "GK sketch) — this exact form is its oracle.",
)
def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_parquet_table(spark, sf_dir, "lineitem")
    pct = F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
    return (
        li.groupBy("l_returnflag")
        .agg(
            pct.alias("p"),
            F.round(F.min("l_extendedprice"), 6).alias("lo"),
            F.round(F.max("l_extendedprice"), 6).alias("hi"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("p")[0], 6).alias("p50"),
            F.round(F.col("p")[1], 6).alias("p90"),
            F.round(F.col("p")[2], 6).alias("p99"),
            "lo",
            "hi",
        )
    )


#: decimal-exact power sums → moments: associative, order-independent,
#: identical in both engines.
_STATS_SQL = f"""
  WITH __sums AS (
    SELECT event_type,
           count(*) AS n,
           {dsum("value")} AS sx,
           {dsum("value * value")} AS sxx,
           {dsum("value * user_id")} AS sxy,
           {dsum("CAST(user_id AS DOUBLE)")} AS sy,
           {dsum("CAST(user_id AS DOUBLE) * user_id")} AS syy
    FROM events
    WHERE value IS NOT NULL AND user_id IS NOT NULL
    GROUP BY event_type
  )
  SELECT event_type, n,
         round(sx / n, 6) AS mean_value,
         round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_value,
         round((sxx - sx * sx / n) / (n - 1), 6) AS var_value,
         round((sxy - sx * sy / n) / (n - 1), 6) AS covar_value_user,
         round((sxy - sx * sy / n)
               / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6)
           AS corr_value_user
  FROM __sums
"""


@register(
    "q_stats",
    _STATS_SQL,
    doc="Per-group second-moment stats (mean/stddev/variance/covariance/"
    "correlation) from decimal-exact power sums — associative ⇒ "
    "deterministic under any partial-agg merge order at 1000-way "
    "parallelism, unlike naive float one-pass co-moments.",
)
def q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # complete-case: every power sum must run over the SAME row support
    # (a NULL value row would be excluded from sx/sxx/sxy but counted
    # in n and included in sy/syy, biasing every statistic)
    ev = read_parquet_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    x = F.col("value")
    y = F.col("user_id").cast("double")
    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        # fast contract: value is a 2-decimal exact ≤ ~560, user_id an
        # integer ≤ 1499 — every product stays on a ≤4-decimal grid far
        # inside 2^53 (bit-identical to spark_dsum, measured this round)
        spark_dsum_fast(x, 2).alias("sx"),
        spark_dsum_fast(x * x, 4).alias("sxx"),
        spark_dsum_fast(x * F.col("user_id"), 2).alias("sxy"),
        spark_dsum_fast(y, 0).alias("sy"),
        spark_dsum_fast(y * F.col("user_id"), 0).alias("syy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sxy, sy, syy = F.col("sxy"), F.col("sy"), F.col("syy")
    # nullif guards: singleton groups (n-1 = 0) and constant columns
    # (zero variance) would raise DIVIDE_BY_ZERO under ANSI where the
    # oracle returns NULL
    nm1 = F.nullif(n - 1, F.lit(0))
    var = (sxx - sx * sx / n) / nm1
    cov = (sxy - sx * sy / n) / nm1
    corr = (sxy - sx * sy / n) / F.nullif(
        F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n), F.lit(0.0)
    )
    return sums.select(
        "event_type",
        "n",
        F.round(sx / n, 6).alias("mean_value"),
        F.round(F.sqrt(var), 6).alias("stddev_value"),
        F.round(var, 6).alias("var_value"),
        F.round(cov, 6).alias("covar_value_user"),
        F.round(corr, 6).alias("corr_value_user"),
    )


SALT_BUCKETS = 16
#: a fact key is "hot" (worth salting) once it exceeds this many rows;
#: everything colder joins unsalted.  Blanket ×SALT_BUCKETS dimension
#: replication paid 16× shuffle on EVERY dim row regardless of skew —
#: the ×10 probe measured 3.4× growth from exactly that constant.
SALT_HOT_MIN = 1000


@register(
    "q_salted_join",
    f"""
  SELECT e.event_type, o.o_orderpriority,
         count(*) AS n_pairs,
         {dsum("e.value")} AS sum_value
  FROM events e
  JOIN (SELECT DISTINCT o_custkey, o_orderpriority FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) o
    ON e.user_id = o.o_custkey
  GROUP BY e.event_type, o.o_orderpriority
""",
    doc="SKEW-AWARE salted join + two-phase aggregation: a heavy-hitter "
    f"pass finds fact keys with > {SALT_HOT_MIN} rows (tiny aggregate, "
    "broadcast back); only those keys get a deterministic fact-side "
    f"salt (event_id % {SALT_BUCKETS}) and ×{SALT_BUCKETS} dimension "
    "replication — cold keys join unsalted with salt 0. Replication "
    "cost is O(|dim| + B·|hot keys|) instead of B·|dim| (the blanket "
    "variant's 16× shuffle on every dim row, which the ×10 probe "
    "flagged). Partial agg on (group, salt) then final agg removes the "
    "salt. Oracle = the plain unsalted join, proving the rewrite is "
    "semantics-preserving for any hot-key set.",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    orders = read_parquet_table(spark, sf_dir, "orders")
    # heavy-hitter pass: keys worth salting (partial-agged count, so the
    # shuffle carries one row per key; result is tiny and broadcasts)
    hot = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > SALT_HOT_MIN)
        .select(F.col("user_id").alias("__hot_key"))
    )
    dim = (
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_custkey", "o_orderpriority")
        .distinct()
    )
    # replicate only hot dim rows; cold rows carry salt 0
    dim_salted = (
        dim.join(
            F.broadcast(hot), dim.o_custkey == F.col("__hot_key"), "left"
        )
        .withColumn(
            "salt",
            F.explode(
                F.when(
                    F.col("__hot_key").isNotNull(),
                    F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .select("o_custkey", "o_orderpriority", "salt")
    )
    fact = ev.join(
        F.broadcast(hot), ev.user_id == F.col("__hot_key"), "left"
    ).withColumn(
        "salt",
        F.when(
            F.col("__hot_key").isNotNull(),
            (F.col("event_id") % SALT_BUCKETS).cast("int"),
        ).otherwise(F.lit(0)),
    )
    joined = fact.join(
        dim_salted,
        (fact.user_id == dim_salted.o_custkey)
        & (fact.salt == dim_salted.salt),
    )
    partial = joined.groupBy("event_type", "o_orderpriority", fact.salt).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(30,6)")).alias("psum"),
    )
    return partial.groupBy("event_type", "o_orderpriority").agg(
        F.sum("pn").alias("n_pairs"),
        F.sum("psum").cast("double").alias("sum_value"),
    )


@register(
    "q_regression_stats",
    f"""
  WITH __s AS (
    SELECT l_returnflag,
           count(*) AS n,
           {dsum("l_quantity")} AS sx,
           {dsum("l_quantity * l_quantity")} AS sxx,
           {dsum("l_extendedprice")} AS sy,
           {dsum("l_extendedprice * l_extendedprice")} AS syy,
           {dsum("l_quantity * l_extendedprice")} AS sxy
    FROM lineitem GROUP BY l_returnflag
  )
  SELECT l_returnflag, n,
         round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
         round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
           AS intercept,
         round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
               / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
  FROM __s
""",
    doc="Per-group OLS regression (price ~ quantity): slope / intercept / "
    "r² from decimal-exact power sums — same associative-merge argument "
    "as q_stats, so 1000-way partial aggregation is deterministic. "
    "Scale path: one narrow shuffle, 6 aggregates in one pass (vs "
    "built-in regr_slope/regr_r2 whose float co-moments are "
    "merge-order-dependent).",
)
def q_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_parquet_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        # fast contract: qty ≤ 50 and price ≤ 1.1e5 are 2-decimal
        # exacts; squares/cross-products are 4-decimal ≤ 1.1e14 scaled
        spark_dsum_fast(x, 2).alias("sx"),
        spark_dsum_fast(x * x, 4).alias("sxx"),
        spark_dsum_fast(y, 2).alias("sy"),
        spark_dsum_fast(y * y, 4).alias("syy"),
        spark_dsum_fast(x * y, 4).alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / F.nullif(
        n * sxx - sx * sx, F.lit(0.0)
    )  # constant-x group: NULL, not an ANSI crash
    return s.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            # same guard as slope: constant x or y zeroes the product
            # exactly — NULL (oracle's x/0), not an ANSI crash
            / F.nullif(
                (n * sxx - sx * sx) * (n * syy - sy * sy), F.lit(0.0)
            ),
            6,
        ).alias("r2"),
    )


@register(
    "q_mode_freq",
    """
  WITH counted AS (
    SELECT l_returnflag, l_quantity, count(*) AS cnt
    FROM lineitem GROUP BY l_returnflag, l_quantity
  ), ranked AS (
    SELECT l_returnflag, l_quantity AS modal_quantity, cnt,
           row_number() OVER (PARTITION BY l_returnflag
                              ORDER BY cnt DESC, l_quantity ASC) AS rn
    FROM counted
  )
  SELECT l_returnflag, modal_quantity, cnt FROM ranked WHERE rn = 1
""",
    doc="Deterministic mode per group: count-then-rank with an explicit "
    "(cnt DESC, value ASC) tiebreak instead of the built-in mode() whose "
    "tie survivor is engine-dependent. Two map-side-combinable shuffles "
    "on (group, value) then (group); no global sort.",
)
def q_mode_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = read_parquet_table(spark, sf_dir, "lineitem")
    counted = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_quantity").asc()
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("modal_quantity"),
            "cnt",
        )
    )


@register(
    "q_histogram",
    f"""
  SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bin,
         count(*) AS n,
         {dsum("l_extendedprice")} AS sum_price,
         round(min(l_extendedprice), 6) AS lo,
         round(max(l_extendedprice), 6) AS hi
  FROM lineitem
  GROUP BY 1
""",
    doc="Fixed-width histogram (5000-unit bins) as a single hash "
    "aggregate: the profile-at-scale primitive — bin arithmetic is "
    "portable floor division (no width_bucket), map-side partials "
    "shrink 100 TB to |bins| rows before the shuffle.",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_parquet_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn(
            "bin", F.floor(F.col("l_extendedprice") / 5000).cast("bigint")
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # price is a 2-decimal exact — fast contract
            spark_dsum_fast(F.col("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.min("l_extendedprice"), 6).alias("lo"),
            F.round(F.max("l_extendedprice"), 6).alias("hi"),
        )
    )


#: per-stratum md5-prefix keep-thresholds: ~30% URGENT, ~10% the rest.
_SAMPLE_THRESH = "CASE WHEN o_orderpriority = '1-URGENT' THEN '4c' ELSE '19' END"


@register(
    "q_hash_sample",
    f"""
  SELECT o_orderpriority,
         count(*) AS n_sampled,
         {dsum("o_totalprice")} AS sum_price
  FROM orders
  WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2)
          <= {_SAMPLE_THRESH}
  GROUP BY o_orderpriority
""",
    doc="Deterministic stratified sampling: keep a row iff a 2-hex-digit "
    "md5(key) prefix clears a per-stratum threshold (~30% for URGENT, "
    "~10% otherwise). Unlike TABLESAMPLE/rand() this is reproducible "
    "across runs, engines, and cluster sizes — the property that makes "
    "100 TB sample pipelines re-runnable — and it pushes down as a "
    "plain filter (no shuffle, no stored sample).",
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_parquet_table(spark, sf_dir, "orders")
    prefix = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2)
    thresh = F.when(
        F.col("o_orderpriority") == "1-URGENT", F.lit("4c")
    ).otherwise(F.lit("19"))
    return (
        orders.filter(prefix <= thresh)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            # totalprice is a 2-decimal exact — fast contract
            spark_dsum_fast(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


#: output schema for the per-group OLS solver
_MODEL_SCHEMA = (
    "event_type STRING, n BIGINT, slope DOUBLE, intercept DOUBLE, r2 DOUBLE"
)


@register(
    "q_grouped_model",
    f"""
  WITH __s AS (
    SELECT event_type,
           count(*) AS n,
           {dsum("CAST(user_id AS DOUBLE)")} AS sx,
           {dsum("CAST(user_id AS DOUBLE) * user_id")} AS sxx,
           {dsum("value")} AS sy,
           {dsum("value * value")} AS syy,
           {dsum("value * user_id")} AS sxy
    FROM events
    WHERE value IS NOT NULL AND user_id IS NOT NULL
    GROUP BY event_type
  )
  SELECT event_type, n,
         round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
         round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
           AS intercept,
         round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
               / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
  FROM __s
""",
    doc="Per-group model fitting with applyInPandas, architected for "
    "100 TB: the corpus NEVER crosses into Python — Spark aggregates "
    "decimal-exact power sums JVM-side (one row per group), and the "
    "grouped-map pandas UDF only runs the closed-form OLS solve on "
    "those six scalars. Same shape as training per-segment models: "
    "heavy reduction in the engine, model math in Python. The solver "
    "evaluates the identical expression sequence as the oracle SQL, so "
    "IEEE double arithmetic agrees bit-for-bit.",
)
def q_grouped_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    # complete-case filter: see q_stats (same support-mismatch bias)
    ev = read_parquet_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    x = F.col("user_id").cast("double")
    y = F.col("value")
    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        # fast contract: user_id integer ≤ 1499, value 2-decimal ≤ ~560
        spark_dsum_fast(x, 0).alias("sx"),
        spark_dsum_fast(x * F.col("user_id"), 0).alias("sxx"),
        spark_dsum_fast(y, 2).alias("sy"),
        spark_dsum_fast(y * y, 4).alias("syy"),
        spark_dsum_fast(y * F.col("user_id"), 2).alias("sxy"),
    )

    def solve(pdf):
        import math

        import pandas as pd

        def r6(v):
            # DuckDB round(double, 6): half-away-from-zero on the scaled
            # binary value (verified: copysign(floor(|v|*1e6+0.5))/1e6
            # matches DuckDB on half-way doubles where Python's round()
            # — round-half-even on the binary value — does NOT, e.g.
            # 0.1234565 -> 0.123457 (DuckDB/this) vs 0.123456 (round))
            return math.copysign(math.floor(abs(v) * 1e6 + 0.5), v) / 1e6

        out = []
        for r in pdf.itertuples(index=False):
            n = float(r.n)
            num = n * r.sxy - r.sx * r.sy
            den = n * r.sxx - r.sx * r.sx
            r2_den = den * (n * r.syy - r.sy * r.sy)
            # degenerate groups (single row / constant x or y) make the
            # denominators 0: emit NULLs to match the oracle instead of
            # killing the executor with ZeroDivisionError
            slope = num / den if den != 0.0 else None
            out.append(
                {
                    "event_type": r.event_type,
                    "n": r.n,
                    "slope": r6(slope) if slope is not None else None,
                    "intercept": (
                        r6((r.sy - slope * r.sx) / n)
                        if slope is not None
                        else None
                    ),
                    "r2": (
                        r6((num * num) / r2_den)
                        if r2_den != 0.0
                        else None
                    ),
                }
            )
        return pd.DataFrame(out)

    return sums.groupBy("event_type").applyInPandas(solve, _MODEL_SCHEMA)


#: value-histogram bin for drift comparison (20-unit bins)
_DRIFT_BIN = "CAST(floor(value / 20) AS BIGINT)"


@register(
    "q_distribution_drift",
    f"""
  WITH __bounds AS (
    SELECT to_timestamp(CAST(floor((floor(epoch(min(ts)))
                                    + floor(epoch(max(ts)))) / 2) AS BIGINT))
             AS mid
    FROM events
  ),
  __binned AS (
    SELECT CASE WHEN ts <= mid THEN 'ref' ELSE 'cur' END AS period,
           event_type, {_DRIFT_BIN} AS bin
    FROM events CROSS JOIN __bounds
  ),
  __counts AS (
    SELECT period, event_type, bin, count(*) AS c
    FROM __binned GROUP BY period, event_type, bin
  ),
  __tot AS (
    SELECT period, event_type, sum(c) AS tot
    FROM __counts GROUP BY period, event_type
  ),
  __tot2 AS (
    SELECT event_type,
           max(CASE WHEN period = 'ref' THEN tot END) AS ref_tot,
           max(CASE WHEN period = 'cur' THEN tot END) AS cur_tot
    FROM __tot GROUP BY event_type
  ),
  __p AS (
    SELECT c.event_type, c.bin,
           coalesce(
             CAST(max(CASE WHEN c.period = 'ref' THEN c ELSE 0 END)
                  AS DOUBLE) / max(t.ref_tot), 0.0) AS p,
           coalesce(
             CAST(max(CASE WHEN c.period = 'cur' THEN c ELSE 0 END)
                  AS DOUBLE) / max(t.cur_tot), 0.0) AS q
    FROM __counts c JOIN __tot2 t USING (event_type)
    GROUP BY c.event_type, c.bin
  )
  SELECT event_type,
         round(CAST(sum(CAST(round(CASE WHEN p > 0 AND q > 0
                                        THEN p * ln(p / q) ELSE 0 END, 9)
                            AS DECIMAL(30,9))) AS DOUBLE), 6) AS kl_ref_cur,
         count(*) AS n_bins,
         CAST(sum(CASE WHEN p = 0 OR q = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS disjoint_bins
  FROM __p GROUP BY event_type
""",
    doc="Distribution-drift monitor: split the stream at its time "
    "midpoint, histogram `value` per event_type in both halves, and "
    "report KL(ref‖cur) over the shared support plus the count of "
    "bins seen in only one half. The production DQ gate for 'did this "
    "feed change shape'. Everything reduces to |types|×|bins| rows "
    "before any ratio is taken — exact integer counts, one ln() "
    "rounded at 6dp.",
)
def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.timestamp_seconds(
            F.floor(
                (
                    F.unix_timestamp(F.min("ts"))
                    + F.unix_timestamp(F.max("ts"))
                )
                / 2
            )
        ).alias("mid")
    )
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        F.when(F.col("ts") <= F.col("mid"), "ref")
        .otherwise("cur")
        .alias("period"),
        "event_type",
        F.floor(F.col("value") / 20).cast("bigint").alias("bin"),
    )
    counts = binned.groupBy("period", "event_type", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = counts.groupBy("period", "event_type").agg(
        F.sum("c").alias("tot")
    )
    # per-TYPE totals join at the type level, not via the counts rows: a
    # bin present in only one half has no row for the other period, so
    # the old max(CASE period THEN tot) gave NULL -> p/q NULL -> the
    # one-sided bin was never counted as disjoint (the DQ signal was
    # dead; the oracle shared the flaw, so parity never caught it)
    tot2 = tot.groupBy("event_type").agg(
        F.max(F.when(F.col("period") == "ref", F.col("tot"))).alias("ref_tot"),
        F.max(F.when(F.col("period") == "cur", F.col("tot"))).alias("cur_tot"),
    )
    joined = counts.join(F.broadcast(tot2), "event_type")
    ref_c = F.max(F.when(F.col("period") == "ref", F.col("c")).otherwise(0))
    cur_c = F.max(F.when(F.col("period") == "cur", F.col("c")).otherwise(0))
    p_q = joined.groupBy("event_type", "bin").agg(
        F.coalesce(
            ref_c.cast("double") / F.max("ref_tot"), F.lit(0.0)
        ).alias("p"),
        F.coalesce(
            cur_c.cast("double") / F.max("cur_tot"), F.lit(0.0)
        ).alias("q"),
    )
    p, q = F.col("p"), F.col("q")
    # round each ln-derived term at 9dp and sum as DECIMAL(30,9): the
    # raw-double sum was partial-agg-merge-order dependent AND libm-
    # divergent in the last ulps (JVM log vs DuckDB log) — the same
    # per-row-round-then-decimal-sum treatment every other libm-derived
    # aggregate here gets (cf. q_info_gain)
    term = F.round(
        F.when((p > 0) & (q > 0), p * F.log(p / q)).otherwise(0.0), 9
    ).cast("decimal(30,9)")
    return p_q.groupBy("event_type").agg(
        F.round(F.sum(term).cast("double"), 6).alias("kl_ref_cur"),
        F.count(F.lit(1)).alias("n_bins"),
        F.sum(F.when((p == 0) | (q == 0), 1).otherwise(0)).alias(
            "disjoint_bins"
        ),
    )


# --- deterministic weighted sampling (Efraimidis–Spirakis) ----------------

#: hex-digit value: position of the char in the hex alphabet, 0-based
def _hexval_sql(fn: str, i: int) -> str:
    return f"({fn}('0123456789abcdef', substr(h, {i}, 1)) - 1)"


#: u in (0,1) from the first 6 md5 hex digits (fn = strpos|instr)
def _uniform_sql(fn: str) -> str:
    val = " + ".join(
        f"{_hexval_sql(fn, i)} * {16 ** (6 - i)}" for i in range(1, 7)
    )
    return f"(({val}) + 0.5) / {16 ** 6}"


@register(
    "q_weighted_sample",
    f"""
  WITH h AS (
    SELECT doc_id, n_chars,
           md5(CAST(doc_id AS VARCHAR)) AS h
    FROM documents
  ),
  keyed AS (
    SELECT doc_id, n_chars,
           round(pow({_uniform_sql("strpos")},
                     1.0 / nullif(n_chars, 0)), 9) AS sample_key
    FROM h
  )
  SELECT doc_id, n_chars, sample_key
  FROM keyed
  ORDER BY sample_key DESC, doc_id
  LIMIT 20
""",
    doc="Deterministic weighted sampling without replacement "
    "(Efraimidis–Spirakis A-ES): per-row uniform u derived from an md5 "
    "hash (reproducible across runs/engines/cluster sizes — no rand()), "
    "key = u^(1/weight) with weight = n_chars, global top-k by key. "
    "A pure map + TakeOrderedAndProject: O(k) state per partition, no "
    "shuffle of the corpus, which is exactly how you draw a weighted "
    "sample from 100 TB in one pass.",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).selectExpr(
        "doc_id",
        "n_chars",
        f"round(pow({_uniform_sql('instr')}, 1.0 / nullif(n_chars, 0)), 9)"
        " AS sample_key",  # zero-weight doc: NULL key (never sampled)
    )
    return keyed.orderBy(F.desc("sample_key"), "doc_id").limit(20)


# --- chi-square independence test ----------------------------------------


@register(
    "q_chi2_independence",
    """
  WITH obs AS (
    SELECT lang, source, count(*) AS c FROM documents GROUP BY lang, source
  ),
  rows_m AS (SELECT lang, sum(c) AS rc FROM obs GROUP BY lang),
  cols_m AS (SELECT source, sum(c) AS cc FROM obs GROUP BY source),
  tot AS (SELECT sum(c) AS n FROM obs)
  SELECT round(CAST(sum(CAST(round(
           pow(coalesce(o.c, 0) - r.rc * c.cc / t.n, 2)
             / (r.rc * c.cc / t.n), 9) AS DECIMAL(30,9))) AS DOUBLE), 6)
           AS chi2,
         (count(DISTINCT r.lang) - 1) * (count(DISTINCT c.source) - 1)
           AS dof,
         CAST(min(t.n) AS BIGINT) AS n
  FROM rows_m r
  CROSS JOIN cols_m c
  CROSS JOIN tot t
  LEFT JOIN obs o ON o.lang = r.lang AND o.source = c.source
""",
    doc="Chi-square independence test over the lang x source contingency "
    "table: observed cell counts (one aggregate on the raw table), "
    "margins and total from the tiny reduced table, expected = "
    "rc*cc/n on the full lang x source grid (cross join of two "
    "broadcast margins — zero cells included, which a naive join-on-"
    "observed silently drops). Detects mixture drift between corpus "
    "slices.",
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    rows_m = obs.groupBy("lang").agg(F.sum("c").alias("rc"))
    cols_m = obs.groupBy("source").agg(F.sum("c").alias("cc"))
    tot = obs.agg(F.sum("c").alias("n"))
    grid = rows_m.crossJoin(F.broadcast(cols_m)).crossJoin(F.broadcast(tot))
    cells = grid.join(obs, ["lang", "source"], "left")
    exp = F.col("rc") * F.col("cc") / F.col("n")
    # per-cell round at 9dp + decimal sum: pow() is libm-derived and a
    # raw-double sum is merge-order dependent (see q_distribution_drift)
    term = F.round(
        F.pow(F.coalesce(F.col("c"), F.lit(0)) - exp, 2) / exp, 9
    ).cast("decimal(30,9)")
    return cells.agg(
        F.round(F.sum(term).cast("double"), 6).alias("chi2"),
        (
            (F.count_distinct("lang") - 1) * (F.count_distinct("source") - 1)
        ).alias("dof"),
        F.min("n").cast("bigint").alias("n"),
    )


# --- equi-depth bucketing -------------------------------------------------

_DECILES = [round(i / 10.0, 1) for i in range(1, 10)]


def _bucket_sql(col: str, bvar: str) -> str:
    """1 + number of decile boundaries strictly below the value."""
    return "1 + " + " + ".join(
        f"(CASE WHEN {col} > {bvar}[{i + 1}] THEN 1 ELSE 0 END)"
        for i in range(9)
    )


@register(
    "q_quantile_bucketing",
    f"""
  WITH b AS (
    SELECT list_transform(quantile_cont(o_totalprice, {_DECILES}),
                          x -> round(x, 6)) AS bs
    FROM orders
  )
  SELECT {_bucket_sql("o.o_totalprice", "b.bs")} AS bucket,
         count(*) AS n,
         round(min(o.o_totalprice), 6) AS lo,
         round(max(o.o_totalprice), 6) AS hi,
         {dsum("o.o_totalprice")} AS sum_price
  FROM orders o CROSS JOIN b
  GROUP BY 1
""",
    doc="Equi-depth (decile) bucketing of order value: exact decile "
    "boundaries from ONE aggregate (at 100 TB: approx_percentile), "
    "broadcast back, bucket = count of boundaries below the value — a "
    "pure map, so assignment is shuffle-free. The ML feature-binning / "
    "range-partition-planning primitive; unlike ntile there is no "
    "global sort anywhere.",
)
def q_quantile_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_parquet_table(spark, sf_dir, "orders")
    pcts = ", ".join(str(p) for p in _DECILES)
    b = orders.selectExpr(
        f"transform(percentile(o_totalprice, array({pcts})), "
        "x -> round(x, 6)) AS bs"
    )
    bucket = F.lit(1)
    for i in range(9):
        bucket = bucket + F.when(
            F.col("o_totalprice") > F.col("bs").getItem(i), 1
        ).otherwise(0)
    return (
        orders.crossJoin(F.broadcast(b))
        .select("o_totalprice", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 6).alias("lo"),
            F.round(F.max("o_totalprice"), 6).alias("hi"),
            # totalprice is a 2-decimal exact — fast contract
            spark_dsum_fast(F.col("o_totalprice"), 2).alias("sum_price"),
        )
    )


# --- deterministic per-group sample ---------------------------------------


@register(
    "q_per_group_sample",
    """
  WITH r AS (
    SELECT event_type, event_id, user_id,
           md5(CAST(event_id AS VARCHAR)) AS h
    FROM events
  ),
  rk AS (
    SELECT event_type, event_id, user_id,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY h, event_id) AS rn
    FROM r
  )
  SELECT event_type, event_id, user_id, rn
  FROM rk WHERE rn <= 5
""",
    doc="Deterministic k-per-group sampling: rank rows inside each group "
    "by an md5 hash of the key (a reproducible shuffle order) and keep "
    "the 5 smallest — a uniform without-replacement sample per stratum "
    "that never changes across runs or cluster sizes. Spark compiles "
    "the rank<=k filter to WindowGroupLimit: each map task keeps a "
    "5-row heap per group BEFORE the shuffle, so the exchange carries "
    "O(groups x k), not the table.",
)
def q_per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_parquet_table(spark, sf_dir, "events")
    r = ev.select(
        "event_type",
        "event_id",
        "user_id",
        F.md5(F.col("event_id").cast("string")).alias("h"),
    )
    w = Window.partitionBy("event_type").orderBy("h", "event_id")
    return (
        r.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_type", "event_id", "user_id", "rn")
    )


# --- robust MAD outliers --------------------------------------------------


@register(
    "q_mad_outliers",
    """
  WITH m AS (
    SELECT event_type, quantile_cont(value, 0.5) AS med
    FROM events GROUP BY event_type
  ),
  d AS (
    SELECT e.event_type, e.value, m.med,
           abs(e.value - m.med) AS adev
    FROM events e JOIN m ON e.event_type = m.event_type
  ),
  md AS (
    SELECT event_type, quantile_cont(adev, 0.5) AS mad
    FROM d GROUP BY event_type
  )
  SELECT d.event_type,
         count(*) AS n,
         CAST(sum(CASE WHEN d.adev > 3.0 * 1.4826 * md.mad
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         round(min(d.med), 6) AS median,
         round(min(md.mad), 6) AS mad
  FROM d JOIN md ON d.event_type = md.event_type
  GROUP BY d.event_type
""",
    doc="Robust outlier detection via median absolute deviation: exact "
    "per-group median, then the median of absolute deviations (two "
    "grouped percentile passes over a low-cardinality key, each a tiny "
    "broadcast back), flag |x - med| > 3 sigma-equivalents (1.4826 x "
    "MAD). Unlike the z-score variant this is immune to the outliers "
    "it hunts; at scale both medians become approx_percentile.",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    d = ev.join(F.broadcast(m), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    md = d.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    flagged = d.join(F.broadcast(md), "event_type")
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.col("adev") > 3.0 * 1.4826 * F.col("mad"), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("n_outliers"),
        F.round(F.min("med"), 6).alias("median"),
        F.round(F.min("mad"), 6).alias("mad"),
    )


# --- pairwise correlation matrix ------------------------------------------

_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount")


def _corr_pairs():
    cols = _CORR_COLS
    return [(cols[i], cols[j]) for i in range(len(cols)) for j in range(i + 1, len(cols))]


def _corr_matrix_sql() -> str:
    sums = []
    for c in _CORR_COLS:
        sums.append(f"{dsum(c)} AS s_{c}")
        sums.append(f"{dsum(f'{c} * {c}')} AS ss_{c}")
    for x, y in _corr_pairs():
        sums.append(f"{dsum(f'{x} * {y}')} AS sp_{x}_{y}")
    selects = []
    for x, y in _corr_pairs():
        selects.append(
            f"""
    SELECT '{x}' AS col_x, '{y}' AS col_y,
           round((n * sp_{x}_{y} - s_{x} * s_{y})
                 / sqrt((n * ss_{x} - s_{x} * s_{x})
                        * (n * ss_{y} - s_{y} * s_{y})), 6) AS corr
    FROM __m"""
        )
    u = "\n    UNION ALL".join(selects)
    return f"""
  WITH __m AS (
    SELECT CAST(count(*) AS DOUBLE) AS n,
           {", ".join(sums)}
    FROM lineitem)
  {u}
"""


@register(
    "q_correlation_matrix",
    _corr_matrix_sql(),
    doc="Pairwise Pearson correlation matrix over lineitem's numeric "
    "columns from ONE scan: all 10 decimal-exact power sums (n, Σx, "
    "Σx², Σxy per pair) come out of a single global aggregate, then "
    "each coefficient is closed-form arithmetic over that one row — "
    "merge-order-independent, so bit-stable at any parallelism. The "
    "long (col_x, col_y, corr) output shape is what a feature-"
    "selection pass feeds on; rounded to 6 (libm sqrt).",
)
def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_parquet_table(spark, sf_dir, "lineitem")
    # spark_dsum_fast contract: the three columns are 2-decimal exacts
    # (qty ≤ 50, price ≤ 1.1e5, discount ≤ 0.1), so pair products are
    # 4-decimal exacts with scaled magnitude ≤ 1.1e14 < 2^53 — the 10
    # decimal sums cost 1.6 s as BigDecimal buffers vs 0.27 s as
    # primitive long pairs (bit-identical; measured this round)
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in _CORR_COLS:
        aggs.append(spark_dsum_fast(F.col(c), 2).alias(f"s_{c}"))
        aggs.append(spark_dsum_fast(F.col(c) * F.col(c), 4).alias(f"ss_{c}"))
    for x, y in _corr_pairs():
        aggs.append(spark_dsum_fast(F.col(x) * F.col(y), 4).alias(f"sp_{x}_{y}"))
    m = li.agg(*aggs)
    # one aggregate row fans out to the 6 pair rows via a struct-array
    # explode — a union of per-pair selects would rescan lineitem per
    # branch (measured: 12 scans); this form is ONE scan by construction
    structs = []
    for x, y in _corr_pairs():
        n, sx, sy = F.col("n"), F.col(f"s_{x}"), F.col(f"s_{y}")
        ssx, ssy, sp = F.col(f"ss_{x}"), F.col(f"ss_{y}"), F.col(f"sp_{x}_{y}")
        corr = F.round(
            (n * sp - sx * sy)
            # nullif: a constant column zeroes the variance product
            # exactly (decimal sums), and ANSI would crash where the
            # oracle's x/0 yields NULL
            / F.nullif(
                F.sqrt((n * ssx - sx * sx) * (n * ssy - sy * sy)),
                F.lit(0.0),
            ),
            6,
        )
        structs.append(
            F.struct(
                F.lit(x).alias("col_x"), F.lit(y).alias("col_y"), corr.alias("corr")
            )
        )
    return m.select(F.explode(F.array(*structs)).alias("p")).select(
        "p.col_x", "p.col_y", "p.corr"
    )


@register(
    "q_anova",
    f"""
  WITH g AS (
    SELECT l_returnflag,
           count(*) AS n,
           {dsum("l_quantity")} AS sx,
           {dsum("l_quantity * l_quantity")} AS sxx
    FROM lineitem GROUP BY l_returnflag
  ),
  t AS (
    SELECT count(*) AS k,
           CAST(sum(n) AS BIGINT) AS n_total,
           {dsum("sx")} AS gsx,
           {dsum("sxx")} AS gsxx,
           {dsum("sx * sx / n")} AS gsb
    FROM g
  )
  SELECT k, n_total,
         round(gsb - gsx * gsx / n_total, 6) AS ss_between,
         round(gsxx - gsb, 6) AS ss_within,
         round(((gsb - gsx * gsx / n_total) / (k - 1))
               / ((gsxx - gsb) / (n_total - k)), 6) AS f_stat
  FROM t
""",
    doc="One-way ANOVA (F-statistic for l_quantity across l_returnflag "
    "groups) from decimal-exact per-group power sums: SS_between = "
    "Σ(sx²/n) − (Σsx)²/N, SS_within = Σsxx − Σ(sx²/n). Two hash "
    "aggregates — the second over k rows — so the whole test is one "
    "scan + one tiny shuffle; the power sums are associative, making "
    "the F value bit-stable under any partial-agg merge order at "
    "1000-way parallelism (a float one-pass variance would not be).",
)
def q_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_parquet_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        # data-sized pass: qty is a 2-decimal exact ≤ 50 (fast contract);
        # the k-row second level below keeps decimal sums (gsb is
        # off-grid: sx²/n division)
        spark_dsum_fast(x, 2).alias("sx"),
        spark_dsum_fast(x * x, 4).alias("sxx"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_total"),
        spark_dsum(F.col("sx")).alias("gsx"),
        spark_dsum(F.col("sxx")).alias("gsxx"),
        spark_dsum(F.col("sx") * F.col("sx") / F.col("n")).alias("gsb"),
    )
    k, n = F.col("k"), F.col("n_total")
    ssb = F.col("gsb") - F.col("gsx") * F.col("gsx") / n
    ssw = F.col("gsxx") - F.col("gsb")
    # nullif guards for degenerate designs (single group: k-1 = 0;
    # saturated: n = k; all groups internally constant: ssw = 0) — the
    # oracle's divisions yield NULL, ANSI must not crash instead
    msw = ssw / F.nullif((n - k).cast("double"), F.lit(0.0))
    f_stat = (ssb / F.nullif((k - 1).cast("double"), F.lit(0.0))) / F.nullif(
        msw, F.lit(0.0)
    )
    return t.select(
        "k",
        "n_total",
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(f_stat, 6).alias("f_stat"),
    )


@register(
    "q_moments",
    f"""
  WITH s AS (
    SELECT event_type, count(*) AS n,
           {dsum("value")} AS s1,
           {dsum("value * value")} AS s2,
           {dsum("value * value * value")} AS s3,
           {dsum("value * value * value * value")} AS s4
    FROM events WHERE value IS NOT NULL GROUP BY event_type
  )
  SELECT event_type, n,
         round(s1 / n, 6) AS mean,
         round(s2 / n - (s1 / n) * (s1 / n), 6) AS m2,
         round((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
               / power(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skewness,
         round((s4 / n - 4 * (s1 / n) * (s3 / n)
                + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
               / power(s2 / n - (s1 / n) * (s1 / n), 2) - 3, 6) AS excess_kurtosis
  FROM s
""",
    doc="Population skewness and excess kurtosis per group from "
    "decimal-exact raw power sums S1..S4 (central moments recovered "
    "algebraically). One scan, one hash agg; the quartic sums stay "
    "within DECIMAL(30,6) for value ≤ ~500 up to ~10^12 rows, so the "
    "shape statistics are deterministic under any 1000-way partial-agg "
    "merge order — the distribution-shape profile a data-quality tier "
    "computes per column at 100 TB.",
)
def q_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # value IS NOT NULL: n is the divisor of sums that skip NULLs
    ev = read_parquet_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    x = F.col("value")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        # value is a 2-decimal exact ≤ ~560: x/x²/x³ stay on the 2/4/6-
        # decimal grids within 2^53 scaled (fast contract); x⁴ is 8dp —
        # past the oracle's 6-digit scale — so it takes the rounded
        # variant (same per-row decimal(30,6) cast, long accumulator)
        spark_dsum_fast(x, 2).alias("s1"),
        spark_dsum_fast(x * x, 4).alias("s2"),
        spark_dsum_fast(x * x * x, 6).alias("s3"),
        spark_dsum_rounded(x * x * x * x).alias("s4"),
    )
    n = F.col("n")
    m1 = F.col("s1") / n
    r2 = F.col("s2") / n
    r3 = F.col("s3") / n
    r4 = F.col("s4") / n
    m2 = r2 - m1 * m1
    m3 = r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1
    m4 = r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2 - 3 * m1 * m1 * m1 * m1
    return s.select(
        "event_type",
        "n",
        F.round(m1, 6).alias("mean"),
        F.round(m2, 6).alias("m2"),
        # nullif: a constant-valued group makes m2 exactly 0 (decimal
        # sums) — skew/kurtosis are NULL (the oracle's x/0), not an
        # ANSI DIVIDE_BY_ZERO crash
        F.round(
            m3 / F.nullif(F.pow(m2, 1.5), F.lit(0.0)), 6
        ).alias("skewness"),
        F.round(
            m4 / F.nullif(F.pow(m2, 2), F.lit(0.0)) - 3, 6
        ).alias("excess_kurtosis"),
    )


@register(
    "q_target_encoding",
    f"""
  WITH g AS (
    SELECT o_orderpriority, count(*) AS n, {dsum("o_totalprice")} AS sx
    FROM orders GROUP BY o_orderpriority
  )
  SELECT o.o_orderkey, o.o_orderpriority,
         round((g.sx - o.o_totalprice) / nullif(g.n - 1, 0), 6)
           AS loo_target_enc
  FROM orders o JOIN g USING (o_orderpriority)
""",
    doc="Leave-one-out target encoding of o_orderpriority against "
    "o_totalprice: per-category (n, Σtarget) reduce to a k-row table "
    "that broadcasts back over the facts, each row's own target "
    "subtracted to prevent leakage — (Σ−x)/(n−1). The encode pass is "
    "map-side-only after one tiny agg shuffle; at 100 TB the category "
    "table stays O(k) regardless of fact size, the standard trick for "
    "high-signal categorical features in training pipelines.",
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_parquet_table(spark, sf_dir, "orders")
    g = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        spark_dsum(F.col("o_totalprice")).alias("sx"),
    )
    return (
        orders.join(F.broadcast(g), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(
                (F.col("sx") - F.col("o_totalprice"))
                / F.nullif(F.col("n") - 1, F.lit(0)),
                6,  # singleton category: NULL, matching the oracle
            ).alias("loo_target_enc"),
        )
    )


#: (feature name, Spark column expr SQL, DuckDB expr SQL) — identical
#: semantics, both engines bucket the same way
_IG_FEATURES = [
    ("priority", "o_orderpriority", "o_orderpriority"),
    (
        "month",
        "CAST(month(o_orderdate) AS STRING)",
        "CAST(month(o_orderdate) AS VARCHAR)",
    ),
    (
        "price_bucket",
        "CAST(CAST(floor(o_totalprice / 50000) AS BIGINT) AS STRING)",
        "CAST(CAST(floor(o_totalprice / 50000) AS BIGINT) AS VARCHAR)",
    ),
]


def _ig_oracle() -> str:
    cells = "\n    UNION ALL ".join(
        f"SELECT '{name}' AS feature, {expr} AS val, o_orderstatus AS y FROM orders"
        for name, _, expr in _IG_FEATURES
    )
    return f"""
  WITH __cells AS (
    {cells}
  ),
  __fvy AS (
    SELECT feature, val, y, count(*) AS n FROM __cells GROUP BY 1, 2, 3
  ),
  __fv AS (SELECT feature, val, CAST(sum(n) AS BIGINT) AS nf
           FROM __fvy GROUP BY 1, 2),
  __fy AS (SELECT feature, y, CAST(sum(n) AS BIGINT) AS ny
           FROM __fvy GROUP BY 1, 2),
  __ft AS (SELECT feature, CAST(sum(n) AS BIGINT) AS nt
           FROM __fvy GROUP BY 1),
  __hy AS (
    SELECT f.feature,
           {dsum("round(-(CAST(ny AS DOUBLE) / nt) * ln(CAST(ny AS DOUBLE) / nt), 6)")} AS h_target
    FROM __fy f JOIN __ft USING (feature) GROUP BY f.feature
  ),
  __hcond AS (
    SELECT c.feature,
           {dsum("round((CAST(c.n AS DOUBLE) / t.nt) * -ln(CAST(c.n AS DOUBLE) / v.nf), 6)")} AS h_cond
    FROM __fvy c
    JOIN __fv v USING (feature, val)
    JOIN __ft t USING (feature)
    GROUP BY c.feature
  )
  SELECT h.feature, round(h.h_target - c.h_cond, 6) AS info_gain
  FROM __hy h JOIN __hcond c USING (feature)
"""


@register(
    "q_info_gain",
    _ig_oracle(),
    doc="Information gain of three candidate features (priority, order "
    "month, 50k price bucket) against o_orderstatus — the feature-"
    "selection scan of a training pipeline. Spark evaluates all three "
    "features in ONE pass: each row explodes into (feature, value, "
    "target) cells, one hash agg builds every contingency table, and "
    "the entropies are computed over the tiny cell tables "
    "(round-then-decimal-sum ⇒ engine-exact). The oracle recomputes "
    "via three scans — same cells, proving the single-pass explode "
    "rewrite.",
)
def q_info_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_parquet_table(spark, sf_dir, "orders")
    cells = orders.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("feature"),
                        F.expr(expr).alias("val"),
                    )
                    for name, expr, _ in _IG_FEATURES
                ]
            )
        ).alias("f"),
        F.col("o_orderstatus").alias("y"),
    ).select("f.feature", "f.val", "y")
    fvy = cells.groupBy("feature", "val", "y").agg(
        F.count(F.lit(1)).alias("n")
    )
    fv = fvy.groupBy("feature", "val").agg(F.sum("n").alias("nf"))
    fy = fvy.groupBy("feature", "y").agg(F.sum("n").alias("ny"))
    ft = fvy.groupBy("feature").agg(F.sum("n").alias("nt"))
    py = F.col("ny").cast("double") / F.col("nt")
    hy = (
        fy.join(ft, "feature")
        .groupBy("feature")
        .agg(spark_dsum(F.round(-py * F.log(py), 6)).alias("h_target"))
    )
    pcell = F.col("n").cast("double") / F.col("nt")
    pcond = F.col("n").cast("double") / F.col("nf")
    hcond = (
        fvy.join(fv, ["feature", "val"])
        .join(ft, "feature")
        .groupBy("feature")
        .agg(spark_dsum(F.round(pcell * -F.log(pcond), 6)).alias("h_cond"))
    )
    return hy.join(hcond, "feature").select(
        "feature",
        F.round(F.col("h_target") - F.col("h_cond"), 6).alias("info_gain"),
    )


# --- privacy tier: DP histogram + k-anonymity audit -----------------------

_DP_EPSILON = 1.0


def _laplace_sql(fn: str) -> str:
    """Inverse-CDF Laplace(b=1/eps) noise from the md5-derived uniform."""
    u = _uniform_sql(fn)
    return (
        f"(CASE WHEN {u} < 0.5 THEN ln(2 * {u})"
        f" ELSE -ln(2 * (1 - {u})) END) / {_DP_EPSILON}"
    )


@register(
    "q_dp_histogram",
    f"""
  WITH c AS (
    SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1
  ),
  hh AS (
    SELECT o_orderpriority, n, md5(o_orderpriority) AS h FROM c
  )
  SELECT o_orderpriority,
         round(n + {_laplace_sql("strpos")}, 6) AS noisy_count
  FROM hh
""",
    doc=f"Differentially-private histogram (ε={_DP_EPSILON}, "
    "sensitivity-1 counts): Laplace noise via inverse-CDF transform of "
    "an md5-derived uniform — reproducible across engines, runs, and "
    "cluster sizes, unlike rand(). The noise is injected AFTER the "
    "exact aggregate, so the plan is the plain count histogram plus a "
    "map over k group rows; at 100 TB the DP release step costs "
    "nothing beyond the aggregate it protects. (A production release "
    "would use a sealed seed rather than the group name.)",
)
def q_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_parquet_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    return c.withColumn("h", F.md5("o_orderpriority")).selectExpr(
        "o_orderpriority",
        f"round(n + {_laplace_sql('instr')}, 6) AS noisy_count",
    )


_K_ANON = 5


@register(
    "q_k_anonymity",
    f"""
  WITH classes AS (
    SELECT c_nationkey, c_mktsegment, count(*) AS sz
    FROM customer GROUP BY 1, 2
  )
  SELECT {_K_ANON} AS k,
         count(*) AS n_classes,
         CAST(sum(sz) AS BIGINT) AS n_rows,
         CAST(min(sz) AS BIGINT) AS k_min,
         CAST(sum(CASE WHEN sz < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
           AS violating_classes,
         CAST(sum(CASE WHEN sz < {_K_ANON} THEN sz ELSE 0 END) AS BIGINT)
           AS rows_to_suppress
  FROM classes
""",
    doc=f"k-anonymity audit (k={_K_ANON}) over the quasi-identifier pair "
    "(c_nationkey, c_mktsegment): equivalence-class sizes from one "
    "hash agg, then the release decision inputs — minimum class size, "
    "violating classes, and rows needing suppression — from a second "
    "agg over the class table (≪ data). The pre-release privacy check "
    "a training-data pipeline runs before exporting user-derived "
    "tables.",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_parquet_table(spark, sf_dir, "customer")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("sz")
    )
    small = F.when(F.col("sz") < _K_ANON, 1).otherwise(0)
    return classes.agg(
        F.lit(_K_ANON).alias("k"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("sz").alias("n_rows"),
        F.min("sz").alias("k_min"),
        F.sum(small).alias("violating_classes"),
        F.sum(small * F.col("sz")).alias("rows_to_suppress"),
    )


@register(
    "q_abtest",
    f"""
  WITH g AS (
    SELECT event_type,
           count(*) AS n,
           {dsum("value")} AS sx,
           {dsum("value * value")} AS sxx
    FROM events WHERE event_type IN ('purchase', 'click')
      AND value IS NOT NULL
    GROUP BY event_type
  ),
  w AS (
    SELECT max(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
           max(CASE WHEN event_type = 'purchase' THEN sx END) AS sx1,
           max(CASE WHEN event_type = 'purchase' THEN sxx END) AS sxx1,
           max(CASE WHEN event_type = 'click' THEN n END) AS n2,
           max(CASE WHEN event_type = 'click' THEN sx END) AS sx2,
           max(CASE WHEN event_type = 'click' THEN sxx END) AS sxx2
    FROM g
  )
  SELECT n1, n2,
         round(sx1 / n1 - sx2 / n2, 6) AS mean_diff,
         round((sx1 / n1 - sx2 / n2)
               / sqrt(((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1
                      + ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2), 6)
           AS t_stat,
         round(pow(((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1
                   + ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2, 2)
               / (pow(((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1, 2) / (n1 - 1)
                  + pow(((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2, 2)
                    / (n2 - 1)), 6) AS welch_df
  FROM w
""",
    doc="Two-sample Welch t-test (purchase vs click event values): "
    "means, t statistic, and Satterthwaite degrees of freedom — all "
    "from the same decimal-exact per-group power sums as q_stats, so "
    "one scan + one two-row aggregate. The experiment-readout "
    "primitive: at 100 TB per-variant sums partial-aggregate map-side "
    "and the test itself is O(1) arithmetic on the final row.",
)
def q_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()  # n1/n2 divide sums that skip NULLs
    )
    x = F.col("value")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        # value is a 2-decimal exact ≤ ~560 — spark_dsum_fast contract
        spark_dsum_fast(x, 2).alias("sx"),
        spark_dsum_fast(x * x, 4).alias("sxx"),
    )
    pick = lambda et, c: F.max(F.when(F.col("event_type") == et, F.col(c)))
    w = g.agg(
        pick("purchase", "n").alias("n1"),
        pick("purchase", "sx").alias("sx1"),
        pick("purchase", "sxx").alias("sxx1"),
        pick("click", "n").alias("n2"),
        pick("click", "sx").alias("sx2"),
        pick("click", "sxx").alias("sxx2"),
    )
    # nullif guards on (n-1) and the zero-variance t denominator:
    # one-sample or constant-value arms would ANSI-crash where the
    # oracle yields NULL
    nm1_1 = F.nullif(F.col("n1") - 1, F.lit(0))
    nm1_2 = F.nullif(F.col("n2") - 1, F.lit(0))
    v1 = (
        (F.col("sxx1") - F.col("sx1") * F.col("sx1") / F.col("n1"))
        / nm1_1
        / F.col("n1")
    )
    v2 = (
        (F.col("sxx2") - F.col("sx2") * F.col("sx2") / F.col("n2"))
        / nm1_2
        / F.col("n2")
    )
    diff = F.col("sx1") / F.col("n1") - F.col("sx2") / F.col("n2")
    return w.select(
        "n1",
        "n2",
        F.round(diff, 6).alias("mean_diff"),
        F.round(
            diff / F.nullif(F.sqrt(v1 + v2), F.lit(0.0)), 6
        ).alias("t_stat"),
        F.round(
            F.pow(v1 + v2, 2)
            / F.nullif(
                F.pow(v1, 2) / nm1_1 + F.pow(v2, 2) / nm1_2, F.lit(0.0)
            ),
            6,
        ).alias("welch_df"),
    )


@register(
    "q_benford",
    """
  WITH d AS (
    SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                AS BIGINT) AS digit
    FROM orders WHERE o_totalprice >= 1
  ),
  c AS (
    SELECT digit, count(*) AS n FROM d GROUP BY digit
  ),
  t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c)
  SELECT digit, n,
         round(n / t.total, 6) AS observed_p,
         round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford_p,
         round(pow(n / t.total - ln(1.0 + 1.0 / digit) / ln(10.0), 2)
               / (ln(1.0 + 1.0 / digit) / ln(10.0)), 6) AS chi2_term
  FROM c CROSS JOIN t
""",
    doc="Benford first-digit conformance check on o_totalprice: observed "
    "leading-digit frequencies vs log10(1 + 1/d) expectation with "
    "per-digit chi-square terms — the classic fraud / synthetic-data "
    "screen a DQ tier runs on monetary columns. First digit via "
    "integer-string slicing (identical in both engines, no float "
    "log10 edge cases); one scan, 9-row output.",
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_parquet_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    c = (
        orders.filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.agg(F.sum("n").cast("double").alias("total"))
    bp = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    obs = F.col("n") / F.col("total")
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.round(obs, 6).alias("observed_p"),
        F.round(bp, 6).alias("benford_p"),
        F.round(F.pow(obs - bp, 2) / bp, 6).alias("chi2_term"),
    )


@register(
    "q_weighted_median",
    f"""
  WITH w AS (
    SELECT l_returnflag, l_extendedprice,
           sum(l_quantity) OVER (
             PARTITION BY l_returnflag ORDER BY l_extendedprice) AS cumw,
           sum(l_quantity) OVER (PARTITION BY l_returnflag) AS total_w
    FROM lineitem
  )
  SELECT l_returnflag,
         round(min(l_extendedprice), 6) AS weighted_median,
         round(CAST(max(total_w) AS DOUBLE), 6) AS total_weight
  FROM w WHERE cumw >= total_w / 2
  GROUP BY l_returnflag
""",
    doc="Quantity-weighted median price per group: one partitioned sort "
    "window builds the cumulative weight (default RANGE frame ⇒ price "
    "ties share one cumw, so the crossing point is deterministic), the "
    "median is min(price) past half the total weight. One shuffle (the "
    "window sort); at 100 TB swap in approx_percentile over repeated "
    "rows or a weighted GK sketch — this exact form is that path's "
    "oracle, like q_quantiles.",
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = read_parquet_table(spark, sf_dir, "lineitem")
    wp = Window.partitionBy("l_returnflag")
    w = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity")
        .over(wp.orderBy("l_extendedprice"))
        .alias("cumw"),
        F.sum("l_quantity").over(wp).alias("total_w"),
    )
    return (
        w.filter(F.col("cumw") >= F.col("total_w") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_extendedprice"), 6).alias("weighted_median"),
            F.round(F.max("total_w").cast("double"), 6).alias("total_weight"),
        )
    )


@register(
    "q_mannwhitney",
    """
  WITH pooled AS (
    SELECT event_type, value,
           rank() OVER (ORDER BY value) AS r_lo,
           count(*) OVER (PARTITION BY value) AS n_ties
    FROM events WHERE event_type IN ('purchase', 'click')
      AND value IS NOT NULL AND NOT isnan(value)
  ),
  ranked AS (
    SELECT event_type,
           r_lo + (n_ties - 1) / 2.0 AS avg_rank
    FROM pooled
  ),
  g AS (
    SELECT count(*) FILTER (event_type = 'purchase') AS n1,
           count(*) FILTER (event_type = 'click') AS n2,
           CAST(SUM(CAST(CASE WHEN event_type = 'purchase'
                              THEN avg_rank ELSE 0 END AS DECIMAL(30,6)))
                AS DOUBLE) AS r1
    FROM ranked
  )
  SELECT n1, n2,
         round(r1 - n1 * (n1 + 1) / 2.0, 6) AS u_stat,
         round((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
               / sqrt(n1 * n2 * (n1 + n2 + 1.0) / 12.0), 6) AS z_score
  FROM g
""",
    doc="Mann-Whitney U test (purchase vs click values), the "
    "nonparametric companion to q_abtest, via a distributed two-pass "
    "histogram rank (no global sort): pass 1 range-buckets the values "
    "and collects the O(B) bucket histogram into rank offsets; pass 2 "
    "reduces to one row per distinct value (map-side partial agg), "
    "ranks within each bucket (Window PARTITIONED by bucket — ties "
    "never span buckets because the bucket is a pure function of the "
    "value), and adds the broadcast offset for the exact global "
    "min-rank. Tie-averaged rank = r_lo + (ties−1)/2 contributes "
    "a_v·avg_rank per distinct value to the decimal-summed rank total, "
    "then U and the normal-approximation z. Every shuffle is keyed "
    "(value / bucket); the only driver collects are the O(1) bounds "
    "and the O(B) histogram. The oracle keeps the single-window "
    "global-sort form this path replaces.",
)
def q_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    n_buckets = 1024
    # NULL / NaN values are excluded SYMMETRICALLY in both engines: a
    # rank over them is meaningless, floor() would map them to a NULL
    # bucket (silently dropped by the inner offset join while the
    # oracle's rank window would still count them), and a None bucket
    # key would crash the histogram sort on the driver
    ev = read_parquet_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
        & ~F.isnan("value")
    )
    # pass 1a: O(1) value bounds (parquet column stats keep this scan
    # cheap; defaults only matter when there are zero qualifying rows)
    bounds = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    ).first()
    lo = bounds["lo"] if bounds["lo"] is not None else 0.0
    hi = bounds["hi"] if bounds["hi"] is not None else 1.0
    span = (hi - lo) or 1.0
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col("value") - F.lit(lo)) / F.lit(span) * n_buckets),
    ).cast("int")

    # pass 1b: bucket histogram → exclusive prefix sums = the global
    # rank offset of each bucket's first value (O(B) driver rows)
    hist = sorted(
        (r["bucket"], r["n"])
        for r in ev.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    offsets, acc = [], 0
    for b, n in hist:
        offsets.append((b, acc))
        acc += n
    offsets_df = spark.createDataFrame(
        offsets or [(0, 0)], "bucket int, bucket_offset long"
    )

    # pass 2: one row per distinct value, ranked inside its bucket
    is_p = F.col("event_type") == "purchase"
    byval = ev.groupBy("value").agg(
        F.count(F.lit(1)).alias("c"),
        F.count(F.when(is_p, 1)).alias("a"),
    )
    wb = (
        Window.partitionBy("bucket")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = (
        byval.withColumn("bucket", bucket)
        .join(F.broadcast(offsets_df), "bucket")
        .select(
            "c",
            "a",
            (
                F.col("bucket_offset")
                + F.coalesce(F.sum("c").over(wb), F.lit(0))
                + 1
            ).alias("r_lo"),
        )
    )
    g = ranked.agg(
        # coalesce: zero qualifying rows must yield counts of 0 (the
        # oracle's count(*) FILTER), not NULL sums
        F.coalesce(F.sum("a"), F.lit(0)).cast("long").alias("n1"),
        F.coalesce(F.sum("c") - F.sum("a"), F.lit(0))
        .cast("long")
        .alias("n2"),
        spark_dsum(
            F.col("a") * (F.col("r_lo") + (F.col("c") - 1) / 2.0)
        ).alias("r1"),
    )
    n1, n2, r1 = F.col("n1"), F.col("n2"), F.col("r1")
    u = r1 - n1 * (n1 + 1) / 2.0
    return g.select(
        "n1",
        "n2",
        F.round(u, 6).alias("u_stat"),
        F.round(
            (u - n1 * n2 / 2.0)
            / F.nullif(  # empty arm: NULL, not an ANSI crash
                F.sqrt(n1 * n2 * (n1 + n2 + 1.0) / 12.0), F.lit(0.0)
            ),
            6,
        ).alias("z_score"),
    )


@register(
    "q_gini",
    f"""
  WITH seg AS (
    SELECT c.c_mktsegment AS segment, o.o_totalprice AS x,
           row_number() OVER (
             PARTITION BY c.c_mktsegment
             ORDER BY o.o_totalprice, o.o_orderkey) AS i,
           count(*) OVER (PARTITION BY c.c_mktsegment) AS n
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  )
  SELECT segment, CAST(max(n) AS BIGINT) AS n_orders,
         round(2.0 * {dsum("i * x")}
               / (max(n) * {dsum("x")})
               - (max(n) + 1.0) / max(n), 6) AS gini
  FROM seg GROUP BY segment
""",
    doc="Gini concentration coefficient of order revenue per market "
    "segment: G = 2·Σ(i·x₍ᵢ₎)/(n·Σx) − (n+1)/n over values sorted "
    "within segment (row_number with an o_orderkey tiebreak makes the "
    "index — and therefore the decimal-summed i·x products — fully "
    "deterministic despite ties). One partitioned sort window + one "
    "hash agg; the revenue-inequality lens on customer concentration.",
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_parquet_table(spark, sf_dir, "orders")
    cust = read_parquet_table(spark, sf_dir, "customer")
    seg = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_totalprice").alias("x"),
            "o_orderkey",
        )
        .withColumn(
            "i",
            F.row_number().over(
                Window.partitionBy("segment").orderBy("x", "o_orderkey")
            ),
        )
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("segment"))
        )
    )
    return seg.groupBy("segment").agg(
        F.max("n").alias("n_orders"),
        F.round(
            2.0
            * spark_dsum(F.col("i") * F.col("x"))
            / (F.max("n") * spark_dsum(F.col("x")))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
    )


# --- winsorized robust moments --------------------------------------------


@register(
    "q_winsorized_stats",
    f"""
  WITH th AS (
    SELECT event_type,
           quantile_cont(value, 0.05) AS lo,
           quantile_cont(value, 0.95) AS hi
    FROM events WHERE value IS NOT NULL GROUP BY event_type
  ),
  c AS (
    SELECT e.event_type,
           CASE WHEN e.value < t.lo THEN t.lo
                WHEN e.value > t.hi THEN t.hi
                ELSE e.value END AS v
    FROM events e JOIN th t ON e.event_type = t.event_type
    WHERE e.value IS NOT NULL
  ),
  s AS (
    SELECT event_type,
           count(*) AS n,
           {dsum("v")} AS sx,
           {dsum("v * v")} AS sxx
    FROM c GROUP BY event_type
  )
  SELECT event_type, n,
         round(sx / n, 6) AS wins_mean,
         round(sqrt((sxx - sx * sx / n) / nullif(n - 1, 0)), 6) AS wins_stddev
  FROM s
""",
    doc="Winsorized moments per group: exact p5/p95 thresholds (tiny "
    "per-group aggregate, broadcast back), values CLAMPED to the band "
    "(not dropped — winsorizing keeps n constant, unlike trimming), "
    "then decimal-exact power sums -> mean/stddev. The robust-scaling "
    "companion to q_mad_outliers: this one produces the statistics a "
    "feature-normalization step consumes, immune to the tails it "
    "clamps. One scan + one broadcast join; at scale the exact "
    "percentile becomes approx_percentile.",
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # value IS NOT NULL: a NULL value would survive the clamp CASE as
    # NULL and be counted in n while absent from the sums
    ev = read_parquet_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    th = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clamped = ev.join(F.broadcast(th), "event_type").select(
        "event_type",
        F.when(F.col("value") < F.col("lo"), F.col("lo"))
        .when(F.col("value") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    s = clamped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        # percentile clamps are interpolated doubles (off-grid) → the
        # rounded variant: oracle-identical per-row cast, long buffers
        spark_dsum_rounded(F.col("v")).alias("sx"),
        spark_dsum_rounded(F.col("v") * F.col("v")).alias("sxx"),
    )
    return s.select(
        "event_type",
        "n",
        F.round(F.col("sx") / F.col("n"), 6).alias("wins_mean"),
        # nullif guards the singleton-group divisor: under the engine's
        # ANSI mode a 1-row group would otherwise raise DIVIDE_BY_ZERO
        # while the oracle returns NULL
        F.round(
            F.sqrt(
                (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                / F.nullif(F.col("n") - 1, F.lit(0))
            ),
            6,
        ).alias("wins_stddev"),
    )

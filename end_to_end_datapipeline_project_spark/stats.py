"""Statistical aggregates and the skew-handling (salted) shuffle pattern.

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

from .registry import dsum, register, spark_dsum
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
    FROM events GROUP BY event_type
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
    ev = read_parquet_table(spark, sf_dir, "events")
    x = F.col("value")
    y = F.col("user_id").cast("double")
    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        spark_dsum(x).alias("sx"),
        spark_dsum(x * x).alias("sxx"),
        spark_dsum(x * F.col("user_id")).alias("sxy"),
        spark_dsum(y).alias("sy"),
        spark_dsum(y * F.col("user_id")).alias("syy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sxy, sy, syy = F.col("sxy"), F.col("sy"), F.col("syy")
    var = (sxx - sx * sx / n) / (n - 1)
    cov = (sxy - sx * sy / n) / (n - 1)
    corr = (sxy - sx * sy / n) / (
        F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)
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
    doc="Skew-resilient salted join + two-phase aggregation: fact side gets "
    "a deterministic salt (event_id % 16), dimension side is replicated "
    "×16 via explode(sequence), join on (key, salt) spreads any hot key "
    "over 16 reducers; partial agg on (group, salt) then final agg "
    "removes the salt. Oracle = the plain unsalted join, proving the "
    "rewrite is semantics-preserving.",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    orders = read_parquet_table(spark, sf_dir, "orders")
    dim = (
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_custkey", "o_orderpriority")
        .distinct()
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1))))
    )
    fact = ev.withColumn("salt", (F.col("event_id") % SALT_BUCKETS).cast("int"))
    joined = fact.join(
        dim,
        (fact.user_id == dim.o_custkey) & (fact.salt == dim.salt),
    )
    partial = joined.groupBy("event_type", "o_orderpriority", fact.salt).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(30,6)")).alias("psum"),
    )
    return partial.groupBy("event_type", "o_orderpriority").agg(
        F.sum("pn").alias("n_pairs"),
        F.sum("psum").cast("double").alias("sum_value"),
    )

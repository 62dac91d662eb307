"""Physical-layout operators: bucketing (co-located shuffle-free joins)
and the partitioned medallion round-trip (write → partition-pruned read).

These exercise the *storage side* of the scale playbook:

- **Bucketing** pre-shuffles a table once at write time (``bucketBy`` on
  the join key).  Two tables bucketed the same way join with **no
  exchange at all** — `.explain` shows SortMergeJoin with no
  ShuffleExchange under either side.  At 100 TB this converts every
  repeated fact-fact join from a full-network shuffle into a local merge.
- **Medallion round-trip** materializes the Silver tier as
  date-partitioned parquet and reads it back through a partition filter —
  the FileScan shows ``PartitionFilters`` and lists only the matching
  ``date=`` directories (what replaces the reference's driver-side
  ``glob.glob``, gtfstransformerSilver.py:11).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline_queries import _cleansed_sql, events_cleansed
from .registry import dsum, register, spark_dsum
from .sources import read_parquet_table

_STAGE_ROOT = "/tmp/spark_graft_physical"

N_BUCKETS = 8


def _stage(sf_dir: str, leaf: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    return f"{_STAGE_ROOT}/{tag}/{leaf}"


@register(
    "q_bucketed_join",
    f"""
  SELECT o.o_orderpriority,
         count(*) AS n_lines,
         {dsum("l.l_quantity")} AS total_qty
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderpriority
""",
    doc="Shuffle-free fact-fact join via bucketing: orders and lineitem "
    f"both written bucketBy({N_BUCKETS}, orderkey) + sortBy, then joined — "
    "the SortMergeJoin has no ShuffleExchange under either side because "
    "the bucket layout IS the hash partitioning, paid once at write time.",
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_parquet_table(spark, sf_dir, "orders")
    li = read_parquet_table(spark, sf_dir, "lineitem")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    t_orders, t_li = f"sg_orders_b_{tag}", f"sg_lineitem_b_{tag}"
    for name, df, key in ((t_orders, orders, "o_orderkey"), (t_li, li, "l_orderkey")):
        if not spark.catalog.tableExists(name):
            (
                df.write.mode("overwrite")
                .option("path", _stage(sf_dir, name))
                .bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .saveAsTable(name)
            )
    # hint("merge"): at test SFs AQE would broadcast the smaller side,
    # hiding the point — at 100 TB neither fact table broadcasts, and the
    # bucket-aligned SortMergeJoin (zero exchanges under the join) is the
    # plan this layout buys.  tests/test_physical.py asserts no shuffle.
    o = spark.table(t_orders).hint("merge")
    l = spark.table(t_li)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            spark_dsum(F.col("l_quantity")).alias("total_qty"),
        )
    )


@register(
    "q_medallion_roundtrip",
    f"""
  {_cleansed_sql(52.0, 52.4, 20.5, 21.5)}
  SELECT date, count(*) AS n_rows,
         {dsum("value")} AS total_value
  FROM __dedup
  WHERE date >= DATE '2024-01-10' AND date < DATE '2024-01-20'
  GROUP BY date
""",
    doc="Medallion Silver round-trip: cleansed events written as "
    "date-partitioned parquet, read back through a partition-range filter "
    "(FileScan PartitionFilters prune to the 10 matching date= dirs — the "
    "Spark-native replacement for the reference's driver-side glob), then "
    "aggregated per date.",
)
def q_medallion_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    silver_dir = _stage(sf_dir, "silver_events")
    marker = f"{silver_dir}/_SUCCESS"
    if not os.path.exists(marker):
        events_cleansed(spark, sf_dir).write.mode("overwrite").partitionBy(
            "date"
        ).parquet(silver_dir)
    back = spark.read.parquet(silver_dir)
    pruned = back.filter(
        (F.col("date") >= F.lit("2024-01-10").cast("date"))
        & (F.col("date") < F.lit("2024-01-20").cast("date"))
    )
    return pruned.groupBy("date").agg(
        F.count(F.lit(1)).alias("n_rows"),
        spark_dsum(F.col("value")).alias("total_value"),
    )

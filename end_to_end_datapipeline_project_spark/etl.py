"""End-to-end batch orchestrator: the engine's equivalent of the
reference's ``main.py --mode transform`` (reference main.py:48-116), as a
library function instead of a script, and incremental instead of
full-rewrite.

Per processing date: Bronze (raw JSON landing zone, Hive date partitions)
→ Silver (typed, cleansed, deduped parquet, partitioned by date) → Gold
(per-line daily report parquet, partitioned by date).  Writes use dynamic
partition overwrite, so re-running a date replaces exactly that date's
partitions — idempotent backfills, no full-table rewrites (the reference
overwrites the entire Silver/Gold tier every run,
gtfstransformerSilver.py:59-60).

The returned report DataFrame is the drill-down entry point; observe()
metrics give drop-rate telemetry without extra passes (cleanse.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cleanse import bronze_to_silver
from .reports import daily_report
from .sources import read_bronze
from .trajectory import TrajectoryConfig, enrich


def _dynamic_overwrite(spark: SparkSession):
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    return prev


def run_batch(
    spark: SparkSession,
    bronze_dir: str,
    silver_dir: str,
    gold_dir: str,
    process_date: str,
    year: int | None = None,
    month: int | None = None,
    day: int | None = None,
) -> DataFrame:
    """Run Bronze → Silver → Gold for one date; returns the Gold report.

    Partition pruning: when year/month/day are given, only that landing
    partition is listed and scanned (reference S5 done Spark-side).
    """
    bronze = read_bronze(spark, bronze_dir, year=year, month=month, day=day)
    silver = bronze_to_silver(bronze, process_date)

    prev = _dynamic_overwrite(spark)
    try:
        silver.write.mode("overwrite").partitionBy("date").parquet(silver_dir)

        # explicit schema: an all-filtered (empty) date writes only
        # _SUCCESS, and schema inference on a file-less dir raises —
        # a no-data day must yield an empty Gold partition, not abort
        # the backfill
        silver_back = spark.read.schema(silver.schema).parquet(
            silver_dir
        ).filter(F.col("date") == F.lit(process_date).cast("date"))
        enriched = enrich(silver_back, TrajectoryConfig())
        report = daily_report(enriched).withColumn(
            "date", F.lit(process_date).cast("date")
        )
        report.write.mode("overwrite").partitionBy("date").parquet(gold_dir)
        gold_schema = report.schema
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return spark.read.schema(gold_schema).parquet(gold_dir).filter(
        F.col("date") == F.lit(process_date).cast("date")
    )

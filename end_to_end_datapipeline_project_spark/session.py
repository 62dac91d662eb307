"""SparkSession factory.

The reference builds a bare ``SparkSession.builder.appName('ETL')`` with no
tuning (reference main.py:55).  At 100 TB that is not acceptable: we pin the
semantics knobs (UTC session timezone, ANSI) so results are oracle-stable,
and the performance knobs (AQE, adaptive coalesce + skew join, Arrow) so the
same logical plans survive a 1000-executor cluster.

Local test mode uses ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "end_to_end_datapipeline_project_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Semantics pins (matter for correctness / oracle parity, SURVEY.md §7.4):

    - ``spark.sql.session.timeZone=UTC`` — timestamp casts and
      ``unix_timestamp`` must agree with the DuckDB oracle.
    - ANSI mode is left at the Spark 4 default (on); every division in the
      engine is guarded with ``nullif``/``try_divide`` semantics.

    Scale pins (matter at 100 TB):

    - AQE + coalesce + skew-join: runtime re-planning fixes stats misses
      and skewed keys (e.g. a hot ``user_id``/``VehicleNumber`` window).
    - ``shuffle.partitions`` sized to the cluster, not the 200 default.
    - Arrow for any pandas edge (vectorized transfer, never row-at-a-time).
    """
    cpus = default_parallelism()
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # local-mode file-split sizing: testdata files are 1-100 MB, so the
        # 128 MB default maps a whole table to 1-3 scan tasks and leaves 29
        # of 32 cores idle in the scan stage (measured 2x on TPC-H Q1
        # shapes).  Size splits so input/cores ≈ one split each; on a real
        # cluster with >128 MB files keep the default — this knob is
        # file-size-relative, not data-size-relative.
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "90g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

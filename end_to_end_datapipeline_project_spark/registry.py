"""Query registry: the driver contract's (queries, oracle_sql) pairs.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions) is
declared here as a named ``Query``: a Spark callable ``(spark, sf_dir) ->
DataFrame`` and, when SQL-expressible, the equivalent ANSI SQL the DuckDB
oracle runs on the same parquet tables.

Oracle-parity conventions (SURVEY.md §7.4), used by every query:

- double aggregates go through ``CAST(SUM(CAST(x AS DECIMAL(30,6))) AS
  DOUBLE)`` — decimal summation is exact, so the result is bit-identical
  regardless of each engine's summation order;
- per-row doubles that involve libm trig (haversine) are ``round(x, 6)``
  (JVM vs C libm may differ in the last ulp);
- ``unix_timestamp`` ≡ DuckDB ``CAST(floor(epoch(ts)) AS BIGINT)``;
- dedup/rank survivors are made deterministic with explicit tiebreaks;
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:  # a silent overwrite would shrink the
            raise ValueError(  # parity matrix with no failing signal
                f"duplicate query registration: {name!r}"
            )
        REGISTRY[name] = Query(name=name, spark_fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {name: q.spark_fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_loaded = False


def _load() -> None:
    """Import every module that registers queries (idempotent)."""
    global _loaded
    if _loaded:
        return
    from . import formats  # noqa: F401
    from . import graph  # noqa: F401
    from . import pipeline_queries  # noqa: F401
    from . import relational  # noqa: F401
    from . import spatial  # noqa: F401
    from . import sql_surface  # noqa: F401
    from . import udx  # noqa: F401
    from . import physical  # noqa: F401
    from . import stats  # noqa: F401
    from . import streaming_queries  # noqa: F401
    from . import timeseries  # noqa: F401
    from .llm_ops import clean, dedup, multimodal, similarity, text  # noqa: F401

    _loaded = True


# shared SQL fragments -----------------------------------------------------

#: decimal-exact sum of a double expression, surfaced as double
def dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"


#: Spark-side equivalent of :func:`dsum`
def spark_dsum(col):
    from pyspark.sql import functions as F

    return F.sum(col.cast("decimal(30,6)")).cast("double")

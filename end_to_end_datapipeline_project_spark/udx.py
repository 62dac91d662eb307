"""User-defined extension surface (SURVEY §2.9): the reference has no
UDFs at all — everything is Column composition, and this engine keeps
that rule for every hot path.  But a complete engine still has to OFFER
the three extension points, each with its scale contract spelled out:

- **Pandas UDAF** (``pandas_udf`` GROUPED_AGG): Arrow-batched aggregate.
  Caveat encoded in the doc: grouped-agg UDAFs are NOT partial-
  aggregated — every group's values ship to Python — so they are for
  aggregates the engine lacks, never for sums it already has.
- **Python UDTF** (Spark 4): table function with LATERAL join.  Row-at-
  a-time; the doc names the built-in (explode) that replaces it when
  semantics allow.
- Pandas UDFs / mapInPandas are exercised throughout llm_ops.

Both queries here are oracle-checked against pure-SQL equivalents,
proving the extension machinery computes exactly what the declarative
form does.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from .registry import dsum, register
from .sources import pin_parallelism, read_parquet_table


def _wmean_udaf():
    """Quantity-weighted mean via math.fsum: exactly-rounded true sums,
    so the result is independent of row order within the group.

    Built lazily — pandas_udf/udtf return-type DDL parsing needs an
    active SparkContext, so decorating at import time would break
    module import order.
    """

    @pandas_udf("double")
    def _wmean(x: pd.Series, w: pd.Series) -> float:
        return math.fsum(x * w) / math.fsum(w)

    return _wmean


@register(
    "q_pandas_udaf_wmean",
    f"""
  SELECT l_returnflag, l_linestatus,
         round({dsum("l_extendedprice * l_quantity")}
               / {dsum("l_quantity")}, 6) AS wmean_price
  FROM lineitem
  GROUP BY l_returnflag, l_linestatus
""",
    doc="Arrow-batched pandas UDAF (GROUPED_AGG): quantity-weighted mean "
    "price per group, summed with math.fsum so row order inside the "
    "group cannot change the answer. Scale contract: grouped-agg UDAFs "
    "skip partial aggregation (each group's columns ship to Python via "
    "Arrow), so reserve them for aggregates Catalyst lacks — the oracle "
    "IS the built-in form this one would be rewritten to.",
)
def q_pandas_udaf_wmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_parquet_table(spark, sf_dir, "lineitem")
    wmean = _wmean_udaf()
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(wmean("l_extendedprice", "l_quantity"), 6).alias(
            "wmean_price"
        ))
    )


def _token_counts_udtf():
    """One row per distinct token with its in-document count (lazy for
    the same SparkContext reason as :func:`_wmean_udaf`)."""

    @udtf(returnType="word: string, n: bigint")
    class _TokenCounts:
        def eval(self, doc_id, text: str):
            import re
            from collections import Counter

            if text is None:
                return
            # explicit class, NOT str.split(): Python splits on extra
            # controls (\x1c-\x1f, \x85) and unicode spaces that the
            # engines' ASCII tokenizers do not.  No str.strip() guard:
            # full-Unicode strip would skip docs (e.g. all-  text)
            # that the ASCII tokenizer still yields tokens for — empty
            # docs simply produce zero tokens below
            toks = [
                t
                for t in re.split(r"[ \t\n\x0b\f\r]+", text.lower())
                if t
            ]
            for w, n in Counter(toks).items():
                yield w, n

    return _TokenCounts


@register(
    "q_python_udtf",
    """
  SELECT doc_id, tok AS word, count(*) AS n
  FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+')) AS tok
    FROM documents WHERE text IS NOT NULL
  )
  WHERE tok <> ''
  GROUP BY doc_id, tok
""",
    doc="Python UDTF surface (Spark 4): per-doc token histogram via a "
    "table function in a LATERAL join. Row-at-a-time Python — the slow "
    "path by design; the oracle is the explode + groupBy form the "
    "engine prefers (JVM-side, partial-aggregated). Registered to show "
    "the extension point works and computes identically.",
)
def q_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__udtf_docs")
    spark.udtf.register("token_counts", _token_counts_udtf())
    return spark.sql(
        """
        SELECT d.doc_id, tc.word, tc.n
        FROM __udtf_docs d, LATERAL token_counts(d.doc_id, d.text) tc
        """
    )


@register(
    "q_cogroup_stats",
    """
  WITH e AS (
    SELECT user_id, count(*) AS n_events FROM events
    WHERE user_id IS NOT NULL GROUP BY user_id
  ),
  o AS (
    SELECT o_custkey AS user_id, count(*) AS n_orders
    FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
  )
  SELECT coalesce(e.user_id, o.user_id) AS user_id,
         coalesce(e.n_events, 0) AS n_events,
         coalesce(o.n_orders, 0) AS n_orders
  FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
""",
    doc="Cogrouped grouped-map surface: two tables grouped on the same "
    "key, both groups handed to one pandas function (the extension "
    "point for per-entity sequence alignment / custom as-of logic the "
    "engine lacks). Scale contract: BOTH groups ship to Python via "
    "Arrow — keep groups bounded; the oracle is the full-outer "
    "aggregate join this reduces to for countable stats.",
)
def q_cogroup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL keys excluded on BOTH sides, mirroring the oracle's WHERE:
    # Spark's cogroup treats NULL as one matching group while SQL's
    # FULL OUTER JOIN never matches NULLs (two separate rows) — the
    # semantics would silently diverge on a fixture with NULL keys
    ev = (
        read_parquet_table(spark, sf_dir, "events")
        .select("user_id")
        .filter(F.col("user_id").isNotNull())
    )
    orders = (
        read_parquet_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("user_id"))
        .filter(F.col("user_id").isNotNull())
    )

    def stats(key, left, right):
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [len(left)],
                "n_orders": [len(right)],
            }
        )

    # per-GROUP Python invocations dominate, not bytes — pin both
    # cogroup sides' fan-out (see sources.pin_parallelism)
    return (
        pin_parallelism(ev, "user_id")
        .groupby("user_id")
        .cogroup(pin_parallelism(orders, "user_id").groupby("user_id"))
        .applyInPandas(
            stats, "user_id BIGINT, n_events BIGINT, n_orders BIGINT"
        )
    )


# --- Spark 4 Python DataSource API ----------------------------------------

_PYDS_N = 10_000
_PYDS_PARTS = 8


def _make_rangesq_source():
    """Build the DataSource class lazily (the datasource module import is
    deferred so merely importing udx never requires it)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _RangeSqPartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class RangeSqReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 10))
            self.parts = int(options.get("parts", 1))

        def partitions(self):
            step = (self.n + self.parts - 1) // self.parts
            return [
                _RangeSqPartition(lo, min(lo + step, self.n))
                for lo in range(0, self.n, step)
            ]

        def read(self, partition):
            for i in range(partition.start, partition.end):
                yield (i, (i * i) % 97)

    class RangeSqSource(DataSource):
        @classmethod
        def name(cls):
            return "rangesq"

        def schema(self):
            return "id bigint, residue bigint"

        def reader(self, schema):
            return RangeSqReader(self.options)

    return RangeSqSource


@register(
    "q_python_datasource",
    f"""
  SELECT residue, count(*) AS n, CAST(min(id) AS BIGINT) AS first_id
  FROM (
    SELECT i AS id, (i * i) % 97 AS residue
    FROM generate_series(0, {_PYDS_N - 1}) AS t(i))
  GROUP BY residue
""",
    doc="Custom source via the Spark 4 Python DataSource API: a "
    f"partition-aware reader ({_PYDS_PARTS} splits of a {_PYDS_N}-row "
    "deterministic sequence) registered with spark.dataSource.register "
    "and consumed like any built-in format — partitions() drives "
    "parallel reads, each executor runs the Python generator for its "
    "split (Arrow-batched). The extension point for bespoke feeds "
    "(internal APIs, queues, proprietary formats) to enter the engine "
    "as first-class DataFrames; the quadratic-residue payload keeps "
    "the output SQL-reproducible for the oracle.",
)
def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    try:
        spark.dataSource.register(_make_rangesq_source())
    except Exception as exc:  # already registered in this session
        if "already" not in str(exc).lower():
            raise
    src = (
        spark.read.format("rangesq")
        .option("n", _PYDS_N)
        .option("parts", _PYDS_PARTS)
        .load()
    )
    return src.groupBy("residue").agg(
        F.count(F.lit(1)).alias("n"), F.min("id").alias("first_id")
    )

"""Spark 4 SQL-surface operators: recursive CTEs, the VARIANT type, and
SQL pipe syntax.

These are engine *capabilities* a reference user would expect a
complete replacement to have, each oracle-checked:

- ``q_recursive_cte``: WITH RECURSIVE hierarchy traversal (node →
  parent = node DIV 2 over customer keys).  Iterative-join recursion
  inside ONE declarative statement — the engine runs a join per level,
  so depth (≈ log₂ n) bounds the iteration count, not row count.
- ``q_variant_extract``: semi-structured ``props`` JSON parsed into the
  binary VARIANT type once, then typed ``variant_get`` paths.  At scale
  VARIANT beats per-access ``get_json_object`` re-parsing (single parse,
  binary-encoded fields, shreddable).
- ``q_pipe_syntax``: the |> operator-chain form of a filter→aggregate
  query — parity proof that the pipe dialect lowers to the same plan as
  the ANSI form (the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import dsum, register
from .sources import read_parquet_table


def _view(spark: SparkSession, sf_dir: str, table: str) -> str:
    """Register <table> as a stable temp view and return the view name."""
    name = f"__sqls_{table}"
    read_parquet_table(spark, sf_dir, table).createOrReplaceTempView(name)
    return name


@register(
    "q_recursive_cte",
    """
  WITH RECURSIVE __tree AS (
    SELECT c_custkey AS node, 0 AS depth FROM customer WHERE c_custkey = 1
    UNION ALL
    SELECT c.c_custkey, t.depth + 1
    FROM customer c
    JOIN __tree t ON CAST(floor(c.c_custkey / 2) AS BIGINT) = t.node
  )
  SELECT depth, count(*) AS n_nodes,
         min(node) AS first_node, max(node) AS last_node
  FROM __tree GROUP BY depth
""",
    doc="Recursive CTE (Spark 4): traverse the implicit binary hierarchy "
    "parent(k) = k DIV 2 from the root key. One join per level, so the "
    "recursion runs log2(n) iterations regardless of table size; each "
    "level is an ordinary equi-join Catalyst plans (broadcast when the "
    "frontier is small). Same statement runs verbatim on DuckDB.",
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    view = _view(spark, sf_dir, "customer")
    return spark.sql(
        f"""
        WITH RECURSIVE __tree AS (
          SELECT c_custkey AS node, 0 AS depth FROM {view}
          WHERE c_custkey = 1
          UNION ALL
          SELECT c.c_custkey, t.depth + 1
          FROM {view} c
          JOIN __tree t ON CAST(floor(c.c_custkey / 2) AS BIGINT) = t.node
        )
        SELECT depth, count(*) AS n_nodes,
               min(node) AS first_node, max(node) AS last_node
        FROM __tree GROUP BY depth
        """
    )


@register(
    "q_variant_extract",
    """
  SELECT event_type,
         count(*) AS n,
         sum(CAST(props->>'$.k' AS BIGINT)) AS sum_k,
         count(DISTINCT CAST(props->>'$.k' AS BIGINT)) AS n_distinct_k
  FROM events
  GROUP BY event_type
""",
    doc="VARIANT ingestion (Spark 4): parse the semi-structured props "
    "column to binary VARIANT once, then typed variant_get path "
    "extraction. One parse per row feeding any number of path reads — "
    "vs get_json_object re-parsing per access; the binary encoding is "
    "also what shredded columnar storage consumes. Oracle = DuckDB "
    "JSON path extraction.",
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    view = _view(spark, sf_dir, "events")
    return spark.sql(
        f"""
        WITH __parsed AS (
          SELECT event_type, parse_json(props) AS pv FROM {view}
        )
        SELECT event_type,
               count(*) AS n,
               sum(variant_get(pv, '$.k', 'bigint')) AS sum_k,
               count(DISTINCT variant_get(pv, '$.k', 'bigint'))
                 AS n_distinct_k
        FROM __parsed
        GROUP BY event_type
        """
    )


@register(
    "q_pipe_syntax",
    f"""
  SELECT l_returnflag,
         count(*) AS n,
         {dsum("l_extendedprice")} AS sum_price
  FROM lineitem
  WHERE l_quantity < 25
  GROUP BY l_returnflag
""",
    doc="SQL pipe syntax (Spark 4): the |> WHERE … |> AGGREGATE chain "
    "lowers to exactly the plan of the ANSI form — the oracle IS that "
    "ANSI form, so the pass proves dialect equivalence.",
)
def q_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    view = _view(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        FROM {view}
        |> WHERE l_quantity < 25
        |> AGGREGATE count(*) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
               AS sum_price
           GROUP BY l_returnflag
        |> SELECT l_returnflag, n, sum_price
        """
    )


@register(
    "q_lateral_topk",
    """
  SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
  FROM customer c, LATERAL (
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 3
  ) t
""",
    doc="Correlated LATERAL subquery (top-3 orders per customer): the "
    "per-row-subquery formulation Catalyst DECORRELATES into a "
    "rank-window over one join — proof the engine turns the O(n·m) "
    "reading into the same single-shuffle plan as the explicit window "
    "form (q_window_rank). Deterministic via the (price, orderkey) "
    "total order.",
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _view(spark, sf_dir, "customer")
    o = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM {c} c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM {o}
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 3
        ) t
        """
    )


@register(
    "q_event_type_map",
    """
  WITH c AS (
    SELECT user_id, event_type, count(*) AS n
    FROM events GROUP BY user_id, event_type
  ),
  w AS (
    SELECT user_id, event_type, n,
           count(*) OVER (PARTITION BY user_id) AS n_types_total
    FROM c
  )
  SELECT user_id, event_type, n, n_types_total
  FROM w
  WHERE n >= 15
""",
    doc="MapType round-trip surface (SURVEY §1.2 notes the reference has "
    "no map columns): per-user event_type->count built as a real "
    "MapType column via map_from_entries(collect_list(struct)), "
    "filtered with the higher-order map_filter (n >= 15), sized before "
    "filtering, then exploded back to rows for the oracle. The map "
    "stays a single row per user through the pipeline — the layout "
    "used for sparse per-entity feature bundles at scale.",
)
def q_event_type_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = read_parquet_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    maps = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("type_counts")
    )
    filtered = maps.select(
        "user_id",
        F.size("type_counts").cast("bigint").alias("n_types_total"),
        F.map_filter("type_counts", lambda k, v: v >= 15).alias("hot"),
    )
    return filtered.select(
        "user_id",
        "n_types_total",
        F.explode("hot").alias("event_type", "n"),
    ).select("user_id", "event_type", "n", "n_types_total")

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
         CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
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


# --- scalar-function parity sweeps ----------------------------------------

# Curated function surfaces where Spark and DuckDB agree exactly; each
# sweep packs many calls into one scan so the whole family is covered by
# a single oracle-checked query (zero shuffles — pure map-side codegen).


@register(
    "q_string_functions",
    """
  SELECT doc_id,
         length(text) AS n_chars,
         upper(substr(text, 1, 3)) AS up3,
         reverse(substr(text, 1, 5)) AS rev5,
         lpad(lang, 5, '_') AS lang_pad,
         repeat(lang, 2) AS lang2,
         instr(text, 'agg') AS agg_pos,
         split_part(text, ' ', 2) AS word2,
         translate(lang, 'en', 'EN') AS lang_tr,
         levenshtein(lang, source) AS lev,
         ascii(source) AS src_ascii,
         concat_ws('|', lang, source) AS lang_src,
         replace(lang, 'e', '3') AS lang_leet,
         md5(substr(text, 1, 16)) AS prefix_sig
  FROM documents
""",
    doc="String-function parity sweep: length/case/reverse/pad/repeat/"
    "find/split_part/translate/levenshtein/ascii/concat_ws/replace/md5 "
    "in one scan-stage projection — every call is JVM-codegen'd, zero "
    "shuffles, and the md5 signature pins exact byte-level agreement.",
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = read_parquet_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.upper(F.substring("text", 1, 3)).alias("up3"),
        F.reverse(F.substring("text", 1, 5)).alias("rev5"),
        F.lpad("lang", 5, "_").alias("lang_pad"),
        F.repeat("lang", 2).alias("lang2"),
        F.instr("text", "agg").alias("agg_pos"),
        F.split_part("text", F.lit(" "), F.lit(2)).alias("word2"),
        F.translate("lang", "en", "EN").alias("lang_tr"),
        F.levenshtein("lang", "source").alias("lev"),
        F.ascii("source").alias("src_ascii"),
        F.concat_ws("|", "lang", "source").alias("lang_src"),
        F.expr("replace(lang, 'e', '3')").alias("lang_leet"),
        F.md5(F.substring("text", 1, 16)).alias("prefix_sig"),
    )


@register(
    "q_datetime_functions",
    """
  SELECT o_orderkey,
         year(o_orderdate) AS y,
         quarter(o_orderdate) AS q,
         month(o_orderdate) AS m,
         day(o_orderdate) AS d,
         dayofweek(o_orderdate) + 1 AS dow,
         weekofyear(o_orderdate) AS iso_week,
         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
         CAST(last_day(o_orderdate) AS DATE) AS month_end,
         o_orderdate + INTERVAL 3 DAY AS plus3,
         datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
           AS days_since_epoch_start,
         strftime(o_orderdate, '%Y-%m') AS ym,
         CAST(floor(epoch(o_orderdate)) AS BIGINT) AS unix_sec,
         make_date(year(o_orderdate), month(o_orderdate), 1) AS first_of_month
  FROM orders
""",
    doc="Datetime-function parity sweep: calendar parts, ISO week, "
    "truncation, last_day, interval arithmetic, day difference, "
    "formatting, epoch seconds, make_date — one scan, zero shuffles. "
    "Cross-engine notes are encoded in the oracle itself (DuckDB "
    "dayofweek is 0-based Sunday vs Spark's 1-based; epoch() is "
    "fractional vs unix_timestamp's floor).",
)
def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    orders = read_parquet_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(od).alias("y"),
        F.quarter(od).alias("q"),
        F.month(od).alias("m"),
        F.dayofmonth(od).alias("d"),
        F.dayofweek(od).alias("dow"),
        F.weekofyear(od).alias("iso_week"),
        F.date_trunc("month", od).alias("month_start"),
        F.last_day(od).alias("month_end"),
        (od + F.expr("INTERVAL 3 DAYS")).alias("plus3"),
        F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.date_format(od, "yyyy-MM").alias("ym"),
        F.unix_timestamp(od).alias("unix_sec"),
        F.make_date(F.year(od), F.month(od), F.lit(1)).alias("first_of_month"),
    )


@register(
    "q_array_functions",
    """
  WITH __v AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 10) AS INTEGER)) AS ia
    FROM embeddings)
  SELECT vec_id,
         len(v) AS n_dims,
         round(v[1], 6) AS first_dim,
         round(v[2] + v[3] + v[4], 6) AS slice_sum,
         round(list_aggregate(v, 'max'), 6) AS vmax,
         round(list_aggregate(v, 'min'), 6) AS vmin,
         round(list_sort(v)[3], 6) AS third_smallest,
         len(list_distinct(ia)) AS n_distinct_deciles,
         list_contains(ia, 5) AS has_half,
         coalesce(list_position(ia, 5), 0) AS half_pos,
         round(list_reverse(v)[1], 6) AS last_dim
  FROM __v
""",
    doc="Array-function parity sweep over the embedding vectors: "
    "size/index/slice arithmetic, min/max aggregation, sort-then-index, "
    "distinct cardinality on a quantized copy, membership + position, "
    "reverse indexing — all higher-order array expressions inside the "
    "scan stage (no explode, no shuffle, no UDF), which is how vector "
    "feature engineering should run over 100 TB of embeddings.",
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    d = emb.select(
        "vec_id",
        v.alias("v"),
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 10).cast("int"),
        ).alias("ia"),
    )
    # try_element_at, not element_at: under the session's ANSI mode an
    # out-of-bounds index would CRASH the query, while the DuckDB
    # oracle's v[k] / list_sort(v)[k] return NULL — try_element_at
    # reproduces the oracle's NULL semantics (latent with the fixed
    # 64-dim testdata, but a shorter vector must not diverge
    # crash-vs-NULL between engines)
    return d.select(
        "vec_id",
        F.size("v").alias("n_dims"),
        F.round(F.try_element_at("v", F.lit(1)), 6).alias("first_dim"),
        F.round(
            F.try_element_at("v", F.lit(2))
            + F.try_element_at("v", F.lit(3))
            + F.try_element_at("v", F.lit(4)),
            6,
        ).alias("slice_sum"),
        F.round(F.array_max("v"), 6).alias("vmax"),
        F.round(F.array_min("v"), 6).alias("vmin"),
        F.round(
            F.try_element_at(F.sort_array("v"), F.lit(3)), 6
        ).alias("third_smallest"),
        F.size(F.array_distinct("ia")).alias("n_distinct_deciles"),
        F.array_contains("ia", 5).alias("has_half"),
        F.array_position("ia", 5).alias("half_pos"),
        F.round(
            F.try_element_at(F.reverse("v"), F.lit(1)), 6
        ).alias("last_dim"),
    )

"""General relational surface: joins, set ops, grouping sets, pivot,
ranking/frame windows (SURVEY.md §2.4 — "the engine's general join surface
comes from Spark"; exercised TPC-H-style on the driver's star schema).

Scale notes (100 TB):

- Dimension joins (region/nation/customer/supplier/part) are broadcast —
  Catalyst picks it below the threshold; we hint explicitly so the plan is
  stable when stats are missing.  Fact-fact joins (orders⋈lineitem) shuffle
  on the join key; AQE handles skew splitting.
- Aggregates use decimal-cast sums (exact ⇒ oracle-stable ⇒ also immune to
  partial-aggregation reordering at 1000-way parallelism).
- Top-k queries are sort+limit ⇒ TakeOrderedAndProject, O(k) per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import dsum, register, spark_dsum, spark_dsum_fast
from .sources import read_parquet_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


@register(
    "q_pricing_summary",
    f"""
  SELECT l_returnflag, l_linestatus,
    {dsum("l_quantity")} AS sum_qty,
    {dsum("l_extendedprice")} AS sum_base_price,
    {dsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
    {dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
    {dsum("l_quantity")} / count(*) AS avg_qty,
    {dsum("l_extendedprice")} / count(*) AS avg_price,
    {dsum("l_discount")} / count(*) AS avg_disc,
    count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
  GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1-shape pricing summary: filter → 8-output hash aggregate "
    "(reference A1 generalized). Decimal-exact sums, map-side partials.",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # spark_dsum_fast contract: qty/price/discount/tax are 2-decimal
    # exacts, so disc_price is a 4-decimal and charge a 6-decimal exact;
    # scaled magnitudes ≤ 1.3e11 < 2^53 (bit-identical to spark_dsum,
    # primitive-long codegen instead of BigDecimal buffers)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            spark_dsum_fast(F.col("l_quantity"), 2).alias("sum_qty"),
            spark_dsum_fast(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            spark_dsum_fast(disc_price, 4).alias("sum_disc_price"),
            spark_dsum_fast(charge, 6).alias("sum_charge"),
            (spark_dsum_fast(F.col("l_quantity"), 2) / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            (
                spark_dsum_fast(F.col("l_extendedprice"), 2) / F.count(F.lit(1))
            ).alias("avg_price"),
            (spark_dsum_fast(F.col("l_discount"), 2) / F.count(F.lit(1))).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_revenue_by_nation",
    f"""
  SELECT n.n_name AS nation,
         {dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
         count(*) AS n_items
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY n.n_name
""",
    doc="TPC-H Q5-shape: 5-way star join with region filter (broadcast dims, "
    "shuffle on the fact-fact key), revenue per nation.",
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    # revenue is a 4-decimal exact (2dp × 2dp) — spark_dsum_fast contract
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        spark_dsum_fast(revenue, 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q_top_customers",
    f"""
  SELECT c.c_custkey, c.c_name,
         {dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
         count(DISTINCT o.o_orderkey) AS n_orders
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY c.c_custkey, c.c_name
  ORDER BY revenue DESC, c_custkey
  LIMIT 20
""",
    doc="TPC-H Q10-shape: returned-item revenue per customer, top-20 "
    "(deterministic: exact decimal revenue + custkey tiebreak).",
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey).join(
        li, orders.o_orderkey == li.l_orderkey
    )
    return (
        joined.groupBy("c_custkey", "c_name")
        .agg(
            # 4-decimal exact product — spark_dsum_fast contract
            spark_dsum_fast(revenue, 4).alias("revenue"),
            F.count_distinct("o_orderkey").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_orders_exists",
    """
  SELECT o_orderpriority, count(*) AS order_count
  FROM orders o
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    )
  GROUP BY o_orderpriority
""",
    doc="TPC-H Q4-shape EXISTS → left-semi join (reference §2.4 gap filled).",
)
def q_orders_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    semi = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q_customers_no_orders",
    """
  SELECT c.c_mktsegment, count(*) AS n_customers
  FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  GROUP BY c.c_mktsegment
""",
    doc="NOT EXISTS → left-anti join.",
)
def q_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    anti = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return anti.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "q_setops",
    """
  WITH building AS (
    SELECT DISTINCT o.o_custkey FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
  ),
  urgent AS (
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  )
  SELECT 'intersect' AS op, count(*) AS n FROM (
    SELECT o_custkey FROM building INTERSECT SELECT o_custkey FROM urgent)
  UNION ALL
  SELECT 'except' AS op, count(*) AS n FROM (
    SELECT o_custkey FROM building EXCEPT SELECT o_custkey FROM urgent)
  UNION ALL
  SELECT 'union' AS op, count(*) AS n FROM (
    SELECT o_custkey FROM building UNION SELECT o_custkey FROM urgent)
""",
    doc="Set operations: UNION / INTERSECT / EXCEPT (reference has none).",
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    building = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("o_custkey")
        .distinct()
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )

    def one(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), "n"
        )

    return (
        one("intersect", building.intersect(urgent))
        .unionAll(one("except", building.subtract(urgent)))
        .unionAll(one("union", building.union(urgent).distinct()))
    )


@register(
    "q_rollup",
    f"""
  SELECT r.r_name AS region, n.n_name AS nation,
         count(*) AS n_customers,
         {dsum("c.c_acctbal")} AS total_acctbal,
         CAST(grouping(r.r_name) AS INTEGER) AS g_region,
         CAST(grouping(n.n_name) AS INTEGER) AS g_nation
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY ROLLUP (r.r_name, n.n_name)
""",
    doc="Hierarchical ROLLUP grouping sets with GROUPING() markers "
    "(beyond the reference's flat groupBy).",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    )
    return (
        joined.select(F.col("r_name").alias("region"), F.col("n_name").alias("nation"), "c_acctbal")
        .rollup("region", "nation")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            spark_dsum_fast(F.col("c_acctbal"), 2).alias("total_acctbal"),
            F.grouping("region").cast("int").alias("g_region"),
            F.grouping("nation").cast("int").alias("g_nation"),
        )
    )


@register(
    "q_pivot",
    f"""
  SELECT c.c_mktsegment,
    {dsum("CASE WHEN o.o_orderstatus = 'O' THEN o.o_totalprice ELSE NULL END")} AS open_total,
    {dsum("CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice ELSE NULL END")} AS finished_total,
    {dsum("CASE WHEN o.o_orderstatus = 'P' THEN o.o_totalprice ELSE NULL END")} AS pending_total
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment
""",
    doc="Pivot (wide aggregation by category) — expressed as conditional "
    "aggregates so both engines produce identical column names.",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)

    def cond_sum(status: str):
        # totalprice is a 2-decimal exact — spark_dsum_fast contract
        return spark_dsum_fast(
            F.when(F.col("o_orderstatus") == status, F.col("o_totalprice")),
            2,
        )

    return joined.groupBy("c_mktsegment").agg(
        cond_sum("O").alias("open_total"),
        cond_sum("F").alias("finished_total"),
        cond_sum("P").alias("pending_total"),
    )


@register(
    "q_window_rank",
    """
  SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
    SELECT o.o_custkey AS c_custkey, o.o_orderkey, o.o_totalprice,
           row_number() OVER (
             PARTITION BY o.o_custkey
             ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
    FROM orders o)
  WHERE rn <= 3
""",
    doc="Ranking window: top-3 orders per customer via row_number with a "
    "deterministic tiebreak (beyond the reference's lag-only windows).",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_running_total",
    """
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
  FROM orders
""",
    doc="Cumulative frame window (rowsBetween unboundedPreceding→current) — "
    "decimal-exact running sum.",
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "q_part_supplier_stats",
    f"""
  SELECT p.p_brand, s.s_name,
         count(*) AS n_lines,
         {dsum("l.l_quantity")} AS total_qty,
         round(max(l.l_extendedprice), 6) AS max_price,
         min(p.p_size) AS min_size
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE p.p_size >= 10
  GROUP BY p.p_brand, s.s_name
""",
    doc="Two broadcast dimension joins + multi-key aggregate with min/max.",
)
def q_part_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 10)
    supp = _t(spark, sf_dir, "supplier")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).join(
        F.broadcast(supp), li.l_suppkey == supp.s_suppkey
    )
    return joined.groupBy("p_brand", "s_name").agg(
        F.count(F.lit(1)).alias("n_lines"),
        spark_dsum_fast(F.col("l_quantity"), 2).alias("total_qty"),
        F.round(F.max("l_extendedprice"), 6).alias("max_price"),
        F.min("p_size").alias("min_size"),
    )


@register(
    "q_approx_distinct",
    """
  SELECT l_returnflag,
         count(DISTINCT l_partkey) AS exact_parts,
         count(DISTINCT l_suppkey) AS exact_supps
  FROM lineitem
  GROUP BY l_returnflag
""",
    doc="Exact distinct counts (oracle side); the engine also exposes "
    "approx_count_distinct (HLL++) as the 100 TB default — see reports.py.",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count_distinct("l_suppkey").alias("exact_supps"),
    )


@register(
    "q_cube",
    f"""
  SELECT c.c_mktsegment AS segment, o.o_orderstatus AS status,
         count(*) AS n_orders,
         {dsum("o.o_totalprice")} AS total_price,
         CAST(grouping(c.c_mktsegment) AS INTEGER) AS g_segment,
         CAST(grouping(o.o_orderstatus) AS INTEGER) AS g_status
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY CUBE (c.c_mktsegment, o.o_orderstatus)
""",
    doc="Full CUBE grouping sets (all 4 combinations) with GROUPING() "
    "markers — completes the grouping-sets surface next to q_rollup.",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        joined.select(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderstatus").alias("status"),
            "o_totalprice",
        )
        .cube("segment", "status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            spark_dsum_fast(F.col("o_totalprice"), 2).alias("total_price"),
            F.grouping("segment").cast("int").alias("g_segment"),
            F.grouping("status").cast("int").alias("g_status"),
        )
    )


@register(
    "q_ntile_lead",
    """
  SELECT o_orderkey, o_custkey,
         ntile(4) OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
           AS price_quartile,
         lead(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS next_order_date,
         CAST(floor(epoch(lead(o_orderdate) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)))
              AS BIGINT)
           - CAST(floor(epoch(o_orderdate)) AS BIGINT) AS sec_to_next
  FROM orders
""",
    doc="ntile + lead windows: per-customer price quartiles and "
    "time-to-next-order (forward-looking counterpart of the reference's "
    "lag-only window surface, W2).",
)
def q_ntile_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w_price = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w_time)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w_price).alias("price_quartile"),
        nxt.alias("next_order_date"),
        (F.unix_timestamp(nxt) - F.unix_timestamp("o_orderdate")).alias(
            "sec_to_next"
        ),
    )


@register(
    "q_merge_upsert",
    f"""
  WITH __updates AS (
    SELECT o_orderkey, round(o_totalprice * 1.1, 6) AS new_price
    FROM orders WHERE o_orderstatus = 'P'
    UNION ALL
    SELECT o_orderkey + 10000000 AS o_orderkey, 123.456 AS new_price
    FROM orders WHERE o_orderkey % 1000 = 0
  )
  SELECT coalesce(t.o_orderkey, u.o_orderkey) AS o_orderkey,
         CASE WHEN t.o_orderkey IS NULL THEN 'inserted'
              WHEN u.o_orderkey IS NULL THEN 'unchanged'
              ELSE 'updated' END AS merge_action,
         round(coalesce(u.new_price, t.o_totalprice), 6) AS o_totalprice
  FROM orders t FULL OUTER JOIN __updates u ON t.o_orderkey = u.o_orderkey
""",
    doc="MERGE INTO (upsert) semantics without a table format: full outer "
    "join of target vs. change set — matched rows take the update, "
    "unmatched-source rows insert, unmatched-target rows pass through. "
    "The same plan a Delta/Iceberg MERGE lowers to; shuffle on the merge "
    "key, AQE handles skew.",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    updates = (
        orders.filter(F.col("o_orderstatus") == "P")
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 1.1, 6).alias("new_price"),
        )
        .unionAll(
            orders.filter(F.col("o_orderkey") % 1000 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                F.lit(123.456).alias("new_price"),
            )
        )
    )
    t, u = orders.alias("t"), updates.alias("u")
    merged = t.join(u, F.col("t.o_orderkey") == F.col("u.o_orderkey"), "full_outer")
    return merged.select(
        F.coalesce(F.col("t.o_orderkey"), F.col("u.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("t.o_orderkey").isNull(), "inserted")
        .when(F.col("u.o_orderkey").isNull(), "unchanged")
        .otherwise("updated")
        .alias("merge_action"),
        F.round(
            F.coalesce(F.col("u.new_price"), F.col("t.o_totalprice")), 6
        ).alias("o_totalprice"),
    )


#: numeric lineitem columns profiled in one scan
_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "q_profile_columns",
    " UNION ALL ".join(
        f"""
  SELECT '{c}' AS column_name,
         count(*) AS n_rows,
         count(*) - count({c}) AS n_nulls,
         count(DISTINCT {c}) AS n_distinct,
         round(min({c}), 6) AS min_value,
         round(max({c}), 6) AS max_value
  FROM lineitem"""
        for c in _PROFILE_COLS
    ),
    doc="One-pass column profiling (the data-quality sweep before any "
    "training-data run): per-column row/null/distinct counts and range, "
    "computed in a single scan with a multi-output aggregate, then "
    "unpivoted — not one scan per column.",
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.count_distinct(c).alias(f"{c}__distinct"),
            F.round(F.min(c), 6).alias(f"{c}__min"),
            F.round(F.max(c), 6).alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS "
            "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
        )
    )


@register(
    "q_min_price_per_part",
    """
  SELECT l.l_partkey, l.l_orderkey, l.l_linenumber,
         round(l.l_extendedprice, 6) AS l_extendedprice
  FROM lineitem l
  WHERE l.l_extendedprice = (
    SELECT min(l2.l_extendedprice) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
""",
    doc="Correlated scalar subquery (TPC-H Q2 shape: row matching its "
    "group's minimum) decorrelated into a min-window + filter — one "
    "shuffle on the correlation key instead of a per-row subquery.",
)
def q_min_price_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("__min_price", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("__min_price"))
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 6).alias("l_extendedprice"),
        )
    )


@register(
    "q_calendar_buckets",
    f"""
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week,
         count(*) AS n_orders,
         {dsum("o_totalprice")} AS total_price
  FROM orders
  GROUP BY date_trunc('month', o_orderdate), date_trunc('week', o_orderdate)
""",
    doc="Calendar bucketing: month + ISO-week truncation (identical "
    "Monday-anchored week semantics in both engines) with per-bucket "
    "rollups — the time-dimension groupBy of every reporting layer.",
)
def q_calendar_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"),
            F.date_trunc("week", "o_orderdate").alias("week"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            spark_dsum_fast(F.col("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "q_moving_window",
    """
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
           RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS spend_7d,
         count(*) OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
           RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS n_orders_7d
  FROM orders
""",
    doc="Time-RANGE frame window (value-based, not row-based): trailing "
    "7-day spend and order count per customer — peers at equal order "
    "dates aggregate together, which a ROWS frame gets wrong.",
)
def q_moving_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-7 * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
        .over(w)
        .cast("double")
        .alias("spend_7d"),
        F.count(F.lit(1)).over(w).alias("n_orders_7d"),
    )


@register(
    "q_nullsafe_join",
    """
  WITH __l AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderkey % 5 END
             AS bucket
    FROM orders
  ),
  __r AS (
    SELECT DISTINCT CASE WHEN i = 5 THEN NULL ELSE i END AS bucket,
           CASE WHEN i = 5 THEN 'null-bucket' ELSE 'b' || CAST(i AS VARCHAR)
             END AS bucket_name
    FROM (SELECT unnest(range(0, 6)) AS i)
  )
  SELECT r.bucket_name, count(*) AS n,
         count(*) FILTER (WHERE l.bucket IS NULL) AS n_null_keys
  FROM __l l JOIN __r r ON l.bucket IS NOT DISTINCT FROM r.bucket
  GROUP BY r.bucket_name
""",
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match the NULL dimension row instead of silently dropping — plus "
    "FILTER-style conditional counts.",
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    l = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_orderkey") % 5)
        .alias("bucket"),
    )
    r = (
        spark.range(6)
        .select(
            F.when(F.col("id") == 5, F.lit(None))
            .otherwise(F.col("id"))
            .alias("bucket"),
            F.when(F.col("id") == 5, F.lit("null-bucket"))
            .otherwise(F.concat(F.lit("b"), F.col("id").cast("string")))
            .alias("bucket_name"),
        )
        .distinct()
    )
    joined = l.join(F.broadcast(r), l.bucket.eqNullSafe(r.bucket))
    return joined.groupBy("bucket_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(l.bucket.isNull(), 1)).alias("n_null_keys"),
    )


@register(
    "q_scd2_history",
    """
  WITH __ordered AS (
    SELECT user_id, event_type AS status, ts, event_id,
           lag(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev_status
    FROM events
  ),
  __changes AS (
    SELECT user_id, status, ts AS effective_from, event_id
    FROM __ordered WHERE prev_status IS NULL OR status <> prev_status
  )
  SELECT user_id, status, effective_from,
         lead(effective_from) OVER (
           PARTITION BY user_id ORDER BY effective_from, event_id)
           AS effective_to,
         lead(effective_from) OVER (
           PARTITION BY user_id ORDER BY effective_from, event_id) IS NULL
           AS is_current
  FROM __changes
""",
    doc="SCD type-2 dimension build from a change stream: per-key change "
    "detection (lag), then effective_from/effective_to intervals (lead) "
    "with NULL = current row. Both windows share ONE shuffle on "
    "user_id; total order (ts, event_id) makes survivor rows "
    "deterministic. This is the streaming-upsert-to-history pattern "
    "every warehouse dim table needs.",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id", F.col("event_type").alias("status"), "ts", "event_id"
        )
        .withColumn("prev_status", F.lag("status").over(w))
        .filter(
            F.col("prev_status").isNull()
            | (F.col("status") != F.col("prev_status"))
        )
        .select(
            "user_id", "status", F.col("ts").alias("effective_from"), "event_id"
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("effective_from", "event_id")
    nxt = F.lead("effective_from").over(w2)
    return changes.select(
        "user_id",
        "status",
        "effective_from",
        nxt.alias("effective_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "q_funnel",
    """
  WITH s1 AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
  ),
  s2 AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.ts > s1.t1
    GROUP BY e.user_id
  ),
  s3 AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    GROUP BY e.user_id
  )
  SELECT (SELECT count(*) FROM s1) AS n_viewed,
         (SELECT count(*) FROM s2) AS n_clicked,
         (SELECT count(*) FROM s3) AS n_purchased
""",
    doc="Ordered funnel (view -> click -> purchase): each stage is a "
    "min-timestamp aggregate followed by a join against the previous "
    "stage's survivors — the user set only shrinks, so at scale each "
    "successive stage joins against a smaller (eventually broadcast) "
    "side. No sessionization state, no window over the full stream.",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_clicked")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchased")))
    )


@register(
    "q_window_navigation",
    """
  SELECT o_orderkey, o_orderpriority,
         first_value(o_totalprice) OVER w AS cheapest,
         nth_value(o_totalprice, 3) OVER w AS third_cheapest,
         round(percent_rank() OVER w, 6) AS pct_rank,
         round(cume_dist() OVER w, 6) AS cume
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    doc="Window navigation surface: first_value / nth_value over an "
    "explicit full frame plus percent_rank / cume_dist, all on one "
    "window spec (one shuffle, one sort). The (price, orderkey) total "
    "order makes navigation values deterministic under ties.",
)
def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_parquet_table(spark, sf_dir, "orders")
    wf = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wr = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.first("o_totalprice").over(wf).alias("cheapest"),
        F.nth_value("o_totalprice", 3).over(wf).alias("third_cheapest"),
        F.round(F.percent_rank().over(wr), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(wr), 6).alias("cume"),
    )


@register(
    "q_full_outer",
    """
  SELECT count(*) AS n_rows,
         count(*) FILTER (WHERE o.o_orderkey IS NULL)
           AS customers_without_orders,
         count(*) FILTER (WHERE c.c_custkey IS NULL)
           AS orders_without_customers,
         count(DISTINCT c.c_custkey) AS matched_customers
  FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
""",
    doc="Full-outer join reconciliation: one pass yields the match "
    "census both directions (the data-quality handshake when two "
    "vendors deliver the 'same' entities). Shuffle on the key, "
    "null-extension both sides.",
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_parquet_table(spark, sf_dir, "customer")
    o = read_parquet_table(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
        ).alias("customers_without_orders"),
        F.sum(
            F.when(F.col("c_custkey").isNull(), 1).otherwise(0)
        ).alias("orders_without_customers"),
        F.count_distinct(F.col("c_custkey")).alias("matched_customers"),
    )


@register(
    "q_grouping_sets",
    f"""
  SELECT l_returnflag, l_linestatus,
         count(*) AS n,
         {dsum("l_extendedprice")} AS sum_price,
         grouping(l_returnflag) AS g_flag,
         grouping(l_linestatus) AS g_status
  FROM lineitem
  GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
    doc="Explicit GROUPING SETS (finer control than ROLLUP/CUBE): three "
    "chosen aggregation levels in ONE scan via the expand operator, "
    "with grouping() flags disambiguating real NULLs from subtotal "
    "rows. At 100 TB this replaces three separate scans+aggs.",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_parquet_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
                 AS sum_price,
               grouping(l_returnflag) AS g_flag,
               grouping(l_linestatus) AS g_status
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


@register(
    "q_union_by_name",
    """
  WITH __a AS (
    SELECT user_id, event_type, value, NULL AS o_totalprice
    FROM events WHERE event_type = 'purchase'
  ),
  __b AS (
    SELECT o_custkey AS user_id, 'order' AS event_type,
           NULL AS value, o_totalprice
    FROM orders WHERE o_orderpriority = '1-URGENT'
  )
  SELECT user_id, event_type,
         count(*) AS n,
         count(value) AS n_with_value,
         count(o_totalprice) AS n_with_price
  FROM (SELECT * FROM __a UNION ALL SELECT * FROM __b)
  GROUP BY user_id, event_type
""",
    doc="Schema-evolution union: unionByName(allowMissingColumns=True) "
    "aligns two sources with different column sets by NAME, null-"
    "filling the gaps — the safe way to append a vendor's new delivery "
    "whose schema drifted (positional UNION would silently misalign).",
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    o = read_parquet_table(spark, sf_dir, "orders")
    a = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_type", "value"
    )
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("user_id"),
        F.lit("order").alias("event_type"),
        "o_totalprice",
    )
    u = a.unionByName(b, allowMissingColumns=True)
    return u.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("value").alias("n_with_value"),
        F.count("o_totalprice").alias("n_with_price"),
    )


@register(
    "q_skew_profile",
    """
  WITH __per_key AS (
    SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
  )
  SELECT count(*) AS n_keys,
         min(cnt) AS min_cnt,
         max(cnt) AS max_cnt,
         round(quantile_cont(cnt, 0.5), 6) AS p50_cnt,
         round(quantile_cont(cnt, 0.99), 6) AS p99_cnt,
         round(CAST(max(cnt) AS DOUBLE) * count(*) / sum(cnt), 6)
           AS skew_factor
  FROM __per_key
""",
    doc="Join/shuffle-key skew diagnosis: per-key count distribution "
    "(min/p50/p99/max) and the skew factor max·|keys|/Σ — the number "
    "that says whether a plain shuffle join is safe or the salted-join "
    "path (q_salted_join) is needed. Two-level aggregation; the second "
    "level sees |keys| rows only.",
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    pct = F.expr("percentile(cnt, array(0.5, 0.99))")
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.min("cnt").alias("min_cnt"),
        F.max("cnt").alias("max_cnt"),
        pct.alias("p"),
        (F.max("cnt").cast("double") * F.count(F.lit(1)) / F.sum("cnt")).alias(
            "sk"
        ),
    ).select(
        "n_keys",
        "min_cnt",
        "max_cnt",
        F.round(F.col("p")[0], 6).alias("p50_cnt"),
        F.round(F.col("p")[1], 6).alias("p99_cnt"),
        F.round("sk", 6).alias("skew_factor"),
    )


@register(
    "q_hopping_window",
    """
  SELECT ws AS window_start, event_type, count(*) AS n
  FROM (
    SELECT unnest([
             date_trunc('day', ts),
             date_trunc('day', ts) - INTERVAL 1 DAY
           ]) AS ws,
           event_type
    FROM events
  )
  GROUP BY ws, event_type
""",
    doc="Hopping (sliding) event-time windows: width 2 days, hop 1 day — "
    "each event lands in exactly width/hop windows via the expand "
    "operator (F.window), then one hash agg. The batch twin of the "
    "streaming sliding-window aggregation.",
)
def q_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 days", "1 day").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n"
        )
    )


@register(
    "q_retention_cohorts",
    """
  WITH __first AS (
    SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
    FROM events GROUP BY user_id
  ),
  __active AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
    FROM events
  ),
  __joined AS (
    SELECT f.cohort_week,
           CAST(floor(date_diff('day', f.cohort_week, a.active_week) / 7)
                AS BIGINT) AS week_offset,
           a.user_id
    FROM __first f JOIN __active a ON f.user_id = a.user_id
  ),
  __sizes AS (
    SELECT cohort_week, count(*) AS cohort_size FROM __first
    GROUP BY cohort_week
  )
  SELECT j.cohort_week, j.week_offset,
         count(DISTINCT j.user_id) AS n_active,
         round(CAST(count(DISTINCT j.user_id) AS DOUBLE) / s.cohort_size, 6)
           AS retention
  FROM __joined j JOIN __sizes s ON j.cohort_week = s.cohort_week
  GROUP BY j.cohort_week, j.week_offset, s.cohort_size
""",
    doc="Retention cohort matrix: cohort = week of first activity, "
    "retention(k) = fraction of the cohort active k weeks later. Three "
    "aggregations, all keyed on user or (cohort, offset) — no window "
    "over the raw stream; the cohort-size side is |cohorts| rows and "
    "broadcasts.",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    joined = first.join(active, "user_id").select(
        "cohort_week",
        F.floor(
            F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
        )
        .cast("bigint")
        .alias("week_offset"),
        "user_id",
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        joined.join(F.broadcast(sizes), "cohort_week")
        .groupBy("cohort_week", "week_offset", "cohort_size")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
    )


@register(
    "q_unpivot",
    f"""
  WITH __w AS (
    SELECT o_orderpriority,
           CAST(count(*) AS DOUBLE) AS n_orders,
           {dsum("o_totalprice")} AS sum_price,
           round(max(o_totalprice), 6) AS max_price
    FROM orders GROUP BY o_orderpriority
  )
  SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM __w
  UNION ALL
  SELECT o_orderpriority, 'sum_price', sum_price FROM __w
  UNION ALL
  SELECT o_orderpriority, 'max_price', max_price FROM __w
""",
    doc="UNPIVOT (wide → long): the inverse of q_pivot, via the native "
    "unpivot/melt operator — each input row expands to |metrics| rows "
    "in the scan stage (an expand, not a shuffle). Long form is what "
    "metric stores and chart sinks consume. Oracle = the UNION ALL "
    "desugaring, proving the operator's semantics.",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_parquet_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        spark_dsum_fast(F.col("o_totalprice"), 2).alias("sum_price"),
        F.round(F.max("o_totalprice"), 6).alias("max_price"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "sum_price", "max_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "q_disjunctive_pushdown",
    f"""
  SELECT p.p_brand,
         count(*) AS n_items,
         {dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
         AND l.l_quantity BETWEEN 1 AND 20)
     OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
         AND l.l_quantity BETWEEN 10 AND 30)
     OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 35
         AND l.l_quantity BETWEEN 20 AND 40)
  GROUP BY p.p_brand
""",
    doc="TPC-H Q19-shaped disjunctive predicate over a join: three "
    "brand/size/quantity OR-arms. Catalyst factors the disjunction into "
    "per-side implied predicates — part gets `p_brand IN (12,23,4) AND "
    "p_size <= 35`, lineitem gets `l_quantity BETWEEN 1 AND 40` — both "
    "PUSHED DOWN to the parquet scans (visible as PushedFilters), so at "
    "100 TB the join sees only candidate rows and the filtered part side "
    "broadcasts; the full OR re-evaluates post-join for exactness.",
)
def q_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_parquet_table(spark, sf_dir, "lineitem")
    part = read_parquet_table(spark, sf_dir, "part")
    arms = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        lineitem.join(
            F.broadcast(part),
            lineitem.l_partkey == part.p_partkey,
        )
        .filter(arms)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # 4-decimal exact product — spark_dsum_fast contract
            spark_dsum_fast(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue"),
        )
    )


@register(
    "q_order_count_distribution",
    """
  SELECT c_count, count(*) AS custdist
  FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey
     AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
  )
  GROUP BY c_count
""",
    doc="TPC-H Q13-shape: customer order-count distribution. Conditional "
    "LEFT OUTER join (predicate inside the ON clause keeps no-order "
    "customers at c_count=0) -> per-customer count -> count-of-counts. "
    "Both aggregations shuffle on keys whose cardinality shrinks each "
    "stage, so the second is nearly free at scale.",
)
def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q_promo_revenue",
    f"""
  SELECT
    100.0 * {dsum("CASE WHEN p.p_type = 'PROMO' "
                  "THEN l.l_extendedprice * (1 - l.l_discount) "
                  "ELSE 0.0 END")}
      / {dsum("l.l_extendedprice * (1 - l.l_discount)")} AS promo_pct,
    count(*) AS n_items
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""",
    doc="TPC-H Q14-shape promo-revenue ratio: month-filtered fact, "
    "broadcast part join, conditional aggregate over the whole result "
    "(ratio of two decimal-exact sums -> deterministic double).",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            # both 4-decimal exact products — spark_dsum_fast contract
            (
                F.lit(100.0) * spark_dsum_fast(promo, 4) / spark_dsum_fast(disc_price, 4)
            ).alias(
                "promo_pct"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_small_qty_revenue",
    f"""
  WITH part_avg AS (
    SELECT l_partkey,
           {dsum("l_quantity")} / count(*) AS avg_qty
    FROM lineitem
    GROUP BY l_partkey
  )
  SELECT {dsum("l.l_extendedprice")} / 7.0 AS avg_yearly,
         count(*) AS n_rows
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN part_avg a ON a.l_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#1'
    AND l.l_quantity < 0.5 * a.avg_qty
""",
    doc="TPC-H Q17-shape small-quantity revenue: the correlated per-part "
    "AVG subquery is decorrelated into one pre-aggregate on the fact "
    "(shuffled once on l_partkey, reused by the join) instead of a "
    "per-row subquery — the only formulation that survives 100 TB.",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    part_avg = li.groupBy("l_partkey").agg(
        (spark_dsum_fast(F.col("l_quantity"), 2) / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(part_avg.withColumnRenamed("l_partkey", "pa_key"),
              F.col("l_partkey") == F.col("pa_key"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (spark_dsum_fast(F.col("l_extendedprice"), 2) / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q_large_orders",
    f"""
  WITH big AS (
    SELECT l_orderkey,
           {dsum("l_quantity")} AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING {dsum("l_quantity")} > 250.0
  )
  SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice, b.total_qty
  FROM big b
  JOIN orders o ON o.o_orderkey = b.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  ORDER BY o.o_totalprice DESC, o.o_orderkey
  LIMIT 100
""",
    doc="TPC-H Q18-shape large-volume orders: HAVING-filtered aggregate on "
    "the fact shrinks it to the rare keys *before* any join touches "
    "orders/customer; deterministic top-100 via tiebroken "
    "TakeOrderedAndProject.",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        # qty is a 2-decimal exact ≤ 50 — spark_dsum_fast contract
        .agg(spark_dsum_fast(F.col("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 250.0)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q_prospects_anti",
    f"""
  SELECT c.c_nationkey,
         count(*) AS numcust,
         {dsum("c.c_acctbal")} AS totacctbal
  FROM customer c
  WHERE c.c_acctbal > (
      SELECT {dsum("c_acctbal")} / count(*)
      FROM customer WHERE c_acctbal > 0.0
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    )
  GROUP BY c.c_nationkey
""",
    doc="TPC-H Q22-shape dormant-prospect census: scalar aggregate "
    "subquery (global positive-balance mean, computed once and "
    "broadcast) + NOT EXISTS re-expressed as a left-anti join against "
    "the date-pruned orders scan, then a per-nation rollup.",
)
def q_prospects_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (spark_dsum_fast(F.col("c_acctbal"), 2) / F.count(F.lit(1))).alias(
                "avg_bal"
            )
        )
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            spark_dsum_fast(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q_supplier_variety",
    """
  SELECT p.p_type, p.p_size,
         count(DISTINCT l.l_suppkey) AS supplier_cnt
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand <> 'Brand#1'
    AND p.p_size IN (1, 5, 9, 13, 17)
    AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
  GROUP BY p.p_type, p.p_size
""",
    doc="TPC-H Q16-shape supplier variety: brand/size-filtered part join "
    "(broadcast), NOT IN subquery re-expressed as a left-anti join "
    "against the tiny excluded-supplier set (broadcast anti join — "
    "never a shuffle), then a grouped exact distinct count (expand + "
    "two-phase aggregate).",
)
def q_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(bad_supp, li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_shipping_priority",
    f"""
  SELECT l.l_orderkey,
         {dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
         o.o_orderdate, o.o_orderpriority
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
    AND l.l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
  ORDER BY revenue DESC, l.l_orderkey
  LIMIT 10
""",
    doc="TPC-H Q3-shape shipping priority: segment-filtered customer "
    "broadcast into orders, date predicates pushed to both fact scans, "
    "revenue per unshipped order, tiebroken top-10 via "
    "TakeOrderedAndProject.",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15 00:00:00").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(spark_dsum_fast(revenue, 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q_forecast_revenue",
    f"""
  SELECT {dsum("l_extendedprice * l_discount")} AS revenue,
         count(*) AS n_rows
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND l_discount BETWEEN 0.05 AND 0.07
    AND l_quantity < 24.0
""",
    doc="TPC-H Q6-shape forecasting-revenue-change: pure scan + "
    "conjunctive predicates (all pushed to parquet row-group stats) + "
    "one global aggregate — the minimal full-scan query; its cost IS "
    "the I/O path, so it benchmarks scan throughput.",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            # 4-decimal exact product — spark_dsum_fast contract
            spark_dsum_fast(
                F.col("l_extendedprice") * F.col("l_discount"), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q_nation_volume",
    f"""
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         year(l.l_shipdate) AS l_year,
         {dsum("l.l_extendedprice * (1 - l.l_discount)")} AS volume
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
      OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
""",
    doc="TPC-H Q7-shape bilateral shipping volume: six-way join where "
    "every dimension (supplier, customer, both nation legs) broadcasts "
    "and the only fact-fact shuffle is lineitem-orders on orderkey; "
    "the symmetric nation-pair disjunction filters after the cheap "
    "broadcast probes.",
)
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nc = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    ns = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .filter(pair)
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        # 4-decimal exact product — spark_dsum_fast contract
        spark_dsum_fast(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
        ).alias("volume")
    )


@register(
    "q_product_profit",
    f"""
  SELECT ns.n_name AS nation, year(o.o_orderdate) AS o_year,
         {dsum("l.l_extendedprice * (1 - l.l_discount)"
               " - 0.1 * p.p_retailprice * l.l_quantity")} AS profit
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  WHERE p.p_type = 'ECONOMY'
  GROUP BY ns.n_name, year(o.o_orderdate)
""",
    doc="TPC-H Q9-shape product profit by nation and year (supply cost "
    "modeled as 10% of part retail price — the testdata has no "
    "partsupp table): part/supplier/nation broadcast, one "
    "orderkey-shuffled fact-fact join, profit expression folded into "
    "the decimal-exact aggregate.",
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(spark_dsum(profit).alias("profit"))
    )


@register(
    "q_top_supplier",
    f"""
  WITH rev AS (
    SELECT l_suppkey,
           {dsum("l_extendedprice * (1 - l_discount)")} AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey
  )
  SELECT s.s_suppkey, s.s_name, r.total_revenue
  FROM rev r
  JOIN supplier s ON s.s_suppkey = r.l_suppkey
  WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
""",
    doc="TPC-H Q15-shape top supplier: quarter-filtered revenue "
    "aggregate, then keep rows equal to the global max — the scalar "
    "subquery decorrelates to a broadcast of one value over the "
    "already-reduced per-supplier table (ties kept, unlike LIMIT 1).",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        # 4-decimal exact product — spark_dsum_fast contract
        spark_dsum_fast(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q_market_share",
    f"""
  WITH all_sales AS (
    SELECT year(o.o_orderdate) AS o_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume,
           ns.n_name AS supp_nation
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = nc.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
  )
  SELECT o_year,
         round({dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
               / {dsum("volume")}, 9) AS mkt_share
  FROM all_sales
  GROUP BY o_year
""",
    doc="TPC-H Q8-shape market share: seven-way star join (every "
    "dimension including both nation legs broadcasts; the only "
    "fact-fact shuffle is lineitem-orders on orderkey) feeding a "
    "conditional-aggregate ratio per order year. Both numerator and "
    "denominator are decimal-exact sums, so the ratio is reproducible "
    "at any parallelism.",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nc = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = _t(spark, sf_dir, "supplier")
    ns = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(reg), F.col("nc_region") == reg.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
    )
    nation_volume = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
        F.lit(0.0)
    )
    return joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(
            # volume is a 4-decimal exact (2dp × 2dp); the when-guarded
            # numerator stays on the same grid (0.0 is on every grid)
            spark_dsum_fast(nation_volume, 4) / spark_dsum_fast(volume, 4), 9
        ).alias("mkt_share")
    )


@register(
    "q_important_parts",
    f"""
  WITH pv AS (
    SELECT l.l_partkey,
           {dsum("l.l_extendedprice * (1 - l.l_discount)")} AS part_value
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
    GROUP BY l.l_partkey
  )
  SELECT l_partkey, part_value
  FROM pv
  WHERE part_value > (SELECT {dsum("part_value")} * 0.002 FROM pv)
""",
    doc="TPC-H Q11-shape value concentration: per-part supplied value "
    "from one nation's suppliers, keeping parts above a fraction of "
    "the global total. The scalar subquery decorrelates to a one-row "
    "broadcast over the already-reduced per-part table; the inner and "
    "outer aggregates share one shuffle (the grouped agg is computed "
    "once and reused for the global re-aggregation).",
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    pv = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(
            # 4-decimal exact product — spark_dsum_fast contract
            spark_dsum_fast(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("part_value")
        )
    )
    threshold = pv.agg(
        # part_value is a 4-decimal exact (exact sum of 4dp products,
        # magnitude ≪ 2^53/1e4) — fast contract holds at the second level
        (spark_dsum_fast(F.col("part_value"), 4) * 0.002).alias("threshold")
    )
    return (
        pv.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


@register(
    "q_shipmode_lateness",
    """
  SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
              THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
         CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
  FROM orders o
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1
""",
    doc="TPC-H Q12-shape lateness-by-priority: the testdata has no ship "
    "mode or commit/receipt dates, so lines are bucketed by shipping "
    "lateness (shipdate > orderdate + 60 days) and counted by order "
    "priority class. One orderkey-shuffled join; the CASE buckets fold "
    "into map-side partial counts over two output groups.",
)
def q_shipmode_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .withColumn("ship_bucket", F.when(late, "LATE").otherwise("ONTIME"))
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q_mincost_supplier",
    """
  WITH ps AS (
    SELECT l_partkey, l_suppkey,
           min(l_extendedprice / l_quantity) AS supply_cost
    FROM lineitem
    WHERE l_quantity > 0
    GROUP BY l_partkey, l_suppkey
  ), eu AS (
    SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
  ), ranked AS (
    SELECT p.p_partkey, p.p_name, e.s_name, e.s_acctbal, e.nation,
           ps.supply_cost AS supply_cost,
           row_number() OVER (
             PARTITION BY p.p_partkey
             ORDER BY ps.supply_cost, e.s_suppkey) AS rn
    FROM ps
    JOIN eu e ON e.s_suppkey = ps.l_suppkey
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
  )
  SELECT p_partkey, p_name, s_name, s_acctbal, nation, supply_cost
  FROM ranked WHERE rn = 1
""",
    doc="TPC-H Q2-shape min-cost supplier: the part-supplier catalog is "
    "derived from lineitem (min observed unit price per pair — the "
    "testdata has no partsupp), restricted to one region's suppliers, "
    "then the correlated per-part MIN decorrelates to a row_number "
    "window with an explicit supplier tiebreak so the survivor is "
    "deterministic on both engines.",
)
def q_mincost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    w = Window.partitionBy("p_partkey").orderBy("supply_cost", "s_suppkey")
    return (
        ps.join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey)
        .join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        # RAW double, no round: both engines compute the identical
        # extendedprice/quantity quotient, and a 6-decimal round can
        # land on an exact half-way value (266.9078125 at sf0.1) where
        # Spark's string-based HALF_UP and DuckDB's rounding disagree
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "nation", "supply_cost")
    )


@register(
    "q_promo_part_suppliers",
    f"""
  WITH agg AS (
    SELECT l.l_suppkey, l.l_partkey,
           {dsum("CASE WHEN year(l.l_shipdate) = 1997 THEN l.l_quantity ELSE 0 END")}
             AS qty_1997,
           {dsum("l.l_quantity")} AS total_qty
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY l.l_suppkey, l.l_partkey
  )
  SELECT s.s_suppkey, s.s_name, n.n_name AS nation
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_5'
    AND s.s_suppkey IN (
      SELECT l_suppkey FROM agg WHERE qty_1997 > 0.2 * total_qty)
""",
    doc="TPC-H Q20-shape supplier promotion: suppliers in one nation "
    "whose 1997 shipments of name-matched parts exceed 20% of their "
    "all-time volume for that part (availqty stands in as total "
    "shipped — no partsupp in the testdata). The IN-subquery becomes "
    "a left-semi join against the already-reduced (supplier, part) "
    "aggregate; part is broadcast into the lineitem scan so the only "
    "shuffle is the grouped aggregation.",
)
def q_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    qty_1997 = F.when(
        F.year("l_shipdate") == 1997, F.col("l_quantity")
    ).otherwise(F.lit(0.0))
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            # qty is a 2-decimal exact; the when-guard keeps the grid
            spark_dsum_fast(qty_1997, 2).alias("qty_1997"),
            spark_dsum_fast(F.col("l_quantity"), 2).alias("total_qty"),
        )
    )
    qualifying = agg.filter(
        F.col("qty_1997") > 0.2 * F.col("total_qty")
    ).select("l_suppkey").distinct()
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


@register(
    "q_waiting_suppliers",
    """
  SELECT s.s_suppkey, s.s_name, count(*) AS numwait
  FROM lineitem l1
  JOIN orders o ON o.o_orderkey = l1.l_orderkey
  JOIN supplier s ON s.s_suppkey = l1.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE o.o_orderstatus = 'F'
    AND n.n_name = 'NATION_1'
    AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
  GROUP BY s.s_suppkey, s.s_name
  ORDER BY numwait DESC, s_suppkey
  LIMIT 20
""",
    doc="TPC-H Q21-shape sole-late-supplier: lateness is modeled as "
    "shipdate > orderdate + 90 days (no receipt/commit dates in the "
    "testdata). Instead of the two correlated EXISTS probes (three "
    "scans of lineitem), the Spark plan decorrelates to ONE grouped "
    "pass per (orderkey, suppkey) computing each supplier's lateness "
    "plus per-order supplier/late-supplier counts via a window — a "
    "supplier qualifies when it is late, the order has >1 supplier, "
    "and it is the only late one. Deterministic top-20 by (numwait "
    "desc, suppkey).",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).cast("int")
    per_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"), F.sum(late).alias("n_late_lines"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_supp.withColumn(
        "n_suppliers", F.count(F.lit(1)).over(w)
    ).withColumn("n_late_suppliers", F.sum("is_late").over(w))
    sole_late = flagged.filter(
        (F.col("is_late") == 1)
        & (F.col("n_suppliers") > 1)
        & (F.col("n_late_suppliers") == 1)
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        sole_late.join(F.broadcast(supp), sole_late.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(20)
    )


@register(
    "q_cdc_compact",
    """
  WITH __ranked AS (
    SELECT user_id, value, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n_changes
    FROM events)
  SELECT user_id, round(value, 6) AS last_value, n_changes
  FROM __ranked
  WHERE rn = 1 AND event_type <> 'error'
""",
    doc="CDC log compaction: a change stream (events keyed by user) "
    "collapses to current state — latest change per key wins by (ts, "
    "event_id), and keys whose latest change is a tombstone ('error') "
    "drop out entirely. One key-partitioned shuffle serves both the "
    "rank and the per-key change count; this is the batch dual of the "
    "foreachBatch serving-table upsert (q_stream_upsert), and at "
    "100 TB it runs per partition-key range with WindowGroupLimit "
    "pushing the rn=1 filter into the sort.",
)
def q_cdc_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_changes", F.count(F.lit(1)).over(wc))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.round("value", 6).alias("last_value"),
            "n_changes",
        )
    )


@register(
    "q_bitmap_distinct",
    """
  SELECT o_orderpriority,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS distinct_customers
  FROM orders
  GROUP BY o_orderpriority
""",
    doc="Exact distinct counting via fixed-size mergeable bitmaps "
    "(bitmap_bit_position / bitmap_construct_agg per 32k-id bucket, then "
    "bitmap_count summed per group). Unlike count_distinct — whose "
    "Expand doubles the shuffled rows — the map side emits one ≤4 KB "
    "bitmap per (group, bucket) regardless of row count, and bitmaps "
    "OR-merge associatively, so the pattern scales to 100 TB facts with "
    "dense integer keys. Oracle = plain COUNT(DISTINCT), proving the "
    "bitmap rewrite exact.",
)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    per_bucket = (
        orders.select(
            "o_orderpriority",
            F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
            F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
        )
        .groupBy("o_orderpriority", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.expr("CAST(sum(bitmap_count(bm)) AS BIGINT)").alias(
            "distinct_customers"
        )
    )


@register(
    "q_pareto_frontier",
    """
  SELECT p.p_partkey, p.p_retailprice, p.p_size
  FROM part p
  WHERE NOT EXISTS (
    SELECT 1 FROM part q
    WHERE q.p_retailprice <= p.p_retailprice
      AND q.p_size >= p.p_size
      AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
""",
    doc="Pareto frontier (skyline: minimize p_retailprice, maximize "
    "p_size). The oracle is the quadratic NOT-EXISTS dominance test; "
    "Spark computes the identical set in O(n log n): collapse to "
    "per-price levels (one hash agg), then a TWO-LEVEL prefix max "
    "(same bucket-of-buckets pattern as clean.py pack_sequences): "
    "levels bucket by price range, the strictly-earlier running max "
    "decomposes into a PARTITIONED within-bucket window plus a "
    "cross-bucket carry computed on the ≤|price range|/width bucket "
    "table — the only unpartitioned window touches bucket rows, never "
    "|distinct prices|. A row survives iff it has its level's max size "
    "and strictly-cheaper levels never reached it.",
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    lvl = (
        part.groupBy("p_retailprice")
        .agg(F.max("p_size").alias("lvl_max"))
        # price-range buckets: TPC-H p_retailprice spans ~[900, 2100],
        # so width 16 gives ~75 buckets at ANY scale factor (the range
        # is data-independent); each bucket's window is partitioned
        .withColumn("bkt", F.floor(F.col("p_retailprice") / F.lit(16.0)))
    )
    w_in = Window.partitionBy("bkt").orderBy("p_retailprice")
    lvl = lvl.withColumn(
        "run_excl",
        F.max("lvl_max").over(w_in.rowsBetween(Window.unboundedPreceding, -1)),
    )
    # cross-bucket carry over the tiny bucket table only (AQE broadcasts
    # the join back); strictly-earlier := earlier level in-bucket OR any
    # level in an earlier bucket
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    carry = (
        lvl.groupBy("bkt")
        .agg(F.max("lvl_max").alias("bmax"))
        .select("bkt", F.max("bmax").over(w_b).alias("carry"))
    )
    # greatest() skips NULLs: NULL only for the globally first level
    strict_cm = F.greatest("run_excl", "carry")
    return (
        part.join(lvl.join(carry, "bkt"), "p_retailprice")
        .filter(
            (strict_cm.isNull() | (strict_cm < F.col("p_size")))
            & (F.col("p_size") == F.col("lvl_max"))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )

"""Graph analytics over relational edges.

PageRank here runs on the supplier *co-supply* graph (suppliers linked
when they ship the same part — the entity-resolution / influence graph a
catalog pipeline builds from lineitem). Connected components lives in
``llm_ops.dedup.connected_components`` (shared by shingle- and
embedding-space dedup clustering).

Reference parity: the reference has no graph tier (SURVEY.md §2.4 "no
joins"); this is part of the 100 TB LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, spark_dsum
from .sources import read_parquet_table

PR_ITERS = 3
PR_DAMP = 0.85


def _pr_iter_sql(prev: str, out: str) -> str:
    return f"""
  {out} AS (
    SELECT n.id,
           0.15 + {PR_DAMP} * coalesce(
             CAST(SUM(CAST(r.pr / d.outdeg AS DECIMAL(30,6))) AS DOUBLE),
             0.0) AS pr
    FROM __nodes n
    LEFT JOIN __edges e ON e.dst = n.id
    LEFT JOIN {prev} r ON r.id = e.src
    LEFT JOIN __deg d ON d.src = e.src
    GROUP BY n.id
  )"""


@register(
    "q_pagerank",
    f"""
  WITH __edges AS (
    SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
    FROM lineitem a JOIN lineitem b
      ON a.l_partkey = b.l_partkey AND a.l_suppkey <> b.l_suppkey
  ),
  __nodes AS (SELECT DISTINCT l_suppkey AS id FROM lineitem),
  __deg AS (
    SELECT src, CAST(count(*) AS DOUBLE) AS outdeg
    FROM __edges GROUP BY src
  ),
  __r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS pr FROM __nodes),
  {_pr_iter_sql("__r0", "__r1")},
  {_pr_iter_sql("__r1", "__r2")},
  {_pr_iter_sql("__r2", "__r3")}
  SELECT id AS supp_id, round(pr, 6) AS pagerank FROM __r3
""",
    doc=f"PageRank ({PR_ITERS} synchronous iterations, damping {PR_DAMP}) "
    "over the supplier co-supply graph. Spark runs the classic "
    "message-passing loop — contributions pr/outdeg shuffled on dst, one "
    "hash-agg per iteration — with the edge list (self-join + distinct, "
    "the expensive part) localCheckpointed ONCE and reused by every "
    "iteration; per-message decimal-quantized sums keep each iteration "
    "bit-identical to the oracle's unrolled-CTE evaluation. At 100 TB "
    "the edge list is pre-partitioned by dst so iterations shuffle only "
    "the O(|V|) rank vector, never the O(|E|) edges.",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_parquet_table(spark, sf_dir, "lineitem")
    # edge generation: ONE shuffle on l_partkey with map-side-combined
    # collect_set (the per-part supplier sets are tiny), then ordered
    # (src < dst) pairs exploded inside the stage and deduped — half the
    # shuffle volume of the naive self-join + distinct over directed
    # pair instances, with identical resulting edge set
    sets = li.groupBy("l_partkey").agg(
        F.sort_array(F.collect_set("l_suppkey")).alias("ss")
    )
    half = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(ss, (x, i) -> "
                "transform(slice(ss, i + 2, size(ss)), "
                "y -> struct(x AS src, y AS dst))))"
            )
        ).alias("p")
    ).select("p.src", "p.dst").distinct()
    edges = half.unionAll(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()  # computed once, reused by all iterations
    nodes = li.select(F.col("l_suppkey").alias("id")).distinct()
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("outdeg")
    )
    contrib = edges.join(F.broadcast(deg), "src").localCheckpoint()
    pr = nodes.withColumn("pr", F.lit(1.0))
    for _ in range(PR_ITERS):
        # pr is O(|V|): broadcast it so iterations shuffle only messages
        msgs = (
            contrib.join(F.broadcast(pr.withColumnRenamed("id", "src")), "src")
            .groupBy("dst")
            .agg(spark_dsum(F.col("pr") / F.col("outdeg")).alias("m"))
        )
        pr = nodes.join(msgs, nodes.id == msgs.dst, "left").select(
            "id",
            (0.15 + PR_DAMP * F.coalesce("m", F.lit(0.0))).alias("pr"),
        )
    return pr.select(
        F.col("id").alias("supp_id"), F.round("pr", 6).alias("pagerank")
    )

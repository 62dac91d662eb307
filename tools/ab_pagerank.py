"""Interleaved A/B of q_pagerank's two edge-gen forms THROUGH THE FULL
QUERY (not edge-gen alone — round 4's docstring claim came from an
edge-gen-only A/B on warm data and did not reproduce in the bench).

A = round-3 form: collect_set per part + in-row ordered-pair explode
B = round-4 form: dedup (part,supp) first + equi-join pair emission

Both share everything downstream (half-edge checkpoint, broadcast-rank
iterations).  Runs alternate A,B,A,B,... in ONE process at sf0.1 and on
the ×K probe dataset, so host CPU-steal noise hits both forms equally
(the only comparison SCALING.md trusts, per its own adjudication notes).

    python tools/ab_pagerank.py [K] [reps]
"""

from __future__ import annotations

import gc
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from end_to_end_datapipeline_project_spark.graph import (  # noqa: E402
    PR_DAMP,
    PR_ITERS,
    _fanout_repartition,
    q_pagerank,
)
from end_to_end_datapipeline_project_spark.registry import (  # noqa: E402
    spark_dsum,
)
from end_to_end_datapipeline_project_spark.session import get_spark  # noqa: E402
from end_to_end_datapipeline_project_spark.sources import (  # noqa: E402
    read_parquet_table,
)


def _pagerank_from_half(li: DataFrame, half: DataFrame) -> DataFrame:
    """Shared tail: identical to q_pagerank past the half-edge list."""
    edges = half.unionAll(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nodes = li.select(F.col("l_suppkey").alias("id")).distinct()
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("outdeg")
    )
    contrib = edges.join(F.broadcast(outdeg), "src")
    pr = None
    for _ in range(PR_ITERS):
        sender = (
            contrib.withColumn("pr", F.lit(1.0))
            if pr is None
            else contrib.join(
                F.broadcast(pr.withColumnRenamed("id", "src")), "src"
            )
        )
        msgs = sender.groupBy("dst").agg(
            spark_dsum(F.col("pr") / F.col("outdeg")).alias("m")
        )
        pr = msgs.select(
            F.col("dst").alias("id"),
            (0.15 + PR_DAMP * F.col("m")).alias("pr"),
        )
    return nodes.join(pr, "id", "left").select(
        F.col("id").alias("supp_id"),
        F.round(F.coalesce("pr", F.lit(0.15)), 6).alias("pagerank"),
    )


def q_pagerank_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-3 edge-gen (git dad4c: collect_set + nested explode)."""
    li = read_parquet_table(spark, sf_dir, "lineitem")
    sets = _fanout_repartition(
        li.groupBy("l_partkey").agg(
            F.sort_array(F.collect_set("l_suppkey")).alias("ss")
        ),
        "l_partkey",
    )
    half = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (x, i) -> "
                    "transform(slice(ss, i + 2, size(ss)), "
                    "y -> x * 4294967296 + y)))"
                )
            ).alias("e")
        )
        .distinct()
        .select(
            F.expr("e DIV 4294967296").alias("src"),
            F.expr("e % 4294967296").alias("dst"),
        )
        .localCheckpoint()
    )
    return _pagerank_from_half(li, half)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab-pagerank")
    from tools.scale_probe import BASE_SF, build

    big_dir = build(spark, k)

    def run(fn, sf_dir) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        return dt

    # warm scan footers + codegen once per dataset
    run(q_pagerank, BASE_SF)
    run(q_pagerank, big_dir)
    for label, sf_dir in (("sf0.1", BASE_SF), (f"x{k}", big_dir)):
        a_times, b_times = [], []
        for _ in range(reps):
            a_times.append(run(q_pagerank_old, sf_dir))
            b_times.append(run(q_pagerank, sf_dir))
        fmt = lambda xs: "/".join(f"{x:.2f}" for x in sorted(xs))  # noqa: E731
        print(
            f"{label}: OLD(collect_set) min={min(a_times):.2f} "
            f"[{fmt(a_times)}]  NEW(join) min={min(b_times):.2f} "
            f"[{fmt(b_times)}]  new/old={min(b_times)/min(a_times):.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()

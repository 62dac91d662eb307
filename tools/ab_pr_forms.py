"""Interleaved A/B of q_pagerank's two remaining form choices, run
THROUGH THE FULL QUERY (same methodology as tools/ab_pagerank.py: all
variants alternate round-robin in ONE process, so host CPU-steal noise
hits every form equally; the per-variant MIN is the quiet-host
estimate).

Axis 1 — per-iteration message-sum kernel (VERDICT r6 finding #1):
  R = spark_dsum_rounded  (per-row decimal cast, primitive-long accum)
  P = spark_dsum          (per-row decimal cast, BigDecimal accum)
  Round 6's batch bench showed q_pagerank 4.76 s -> 5.70 s with the R
  swap as the only code change on the path; this adjudicates it.

Axis 2 — rank distribution per iteration (VERDICT r6 task #6):
  B = broadcast rank vector      (edges never move; O(|V|) broadcast)
  J = shuffle-join on a src-partitioned checkpointed edge list
      (rank vector shuffles; edges stay put via preserved partitioning)
  Run at iterations 3 (the registered query) and 10 (the amortization
  case the docstring caveat flagged).

    python tools/ab_pr_forms.py [K] [reps]     # default K=10, reps=4
"""

from __future__ import annotations

import gc
import sys
import time

sys.path.insert(0, "/root/repo")

from end_to_end_datapipeline_project_spark.graph import pagerank  # noqa: E402
from end_to_end_datapipeline_project_spark.session import get_spark  # noqa: E402
from end_to_end_datapipeline_project_spark.sources import (  # noqa: E402
    read_parquet_table,
)

SF01 = "/root/testdata/sf0.1"


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab-pr-forms")
    from tools.scale_probe import build

    big_dir = build(spark, k)

    def run(sf_dir: str, **kw) -> float:
        li = read_parquet_table(spark, sf_dir, "lineitem")
        t0 = time.time()
        pagerank(li, **kw).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        return dt

    # (label, sf_dir, kwargs) — interleaved within each experiment block
    experiments = [
        (
            "axis1: msg-sum kernel, iters=3",
            [
                ("R@sf0.1", SF01, dict(rounded_msg_sum=True)),
                ("P@sf0.1", SF01, dict(rounded_msg_sum=False)),
                ("R@x%d" % k, big_dir, dict(rounded_msg_sum=True)),
                ("P@x%d" % k, big_dir, dict(rounded_msg_sum=False)),
            ],
        ),
        (
            "axis2: rank distribution",
            [
                ("B3@x%d" % k, big_dir, dict(broadcast_ranks=True, iters=3)),
                ("J3@x%d" % k, big_dir, dict(broadcast_ranks=False, iters=3)),
                (
                    "B10@x%d" % k,
                    big_dir,
                    dict(broadcast_ranks=True, iters=10),
                ),
                (
                    "J10@x%d" % k,
                    big_dir,
                    dict(broadcast_ranks=False, iters=10),
                ),
            ],
        ),
    ]
    for title, variants in experiments:
        print(f"== {title} ==", flush=True)
        # warm footers + codegen once per variant, untimed
        for _, sf_dir, kw in variants:
            run(sf_dir, **kw)
        times: dict[str, list[float]] = {lbl: [] for lbl, _, _ in variants}
        for _ in range(reps):
            for lbl, sf_dir, kw in variants:
                times[lbl].append(run(sf_dir, **kw))
        for lbl, _, _ in variants:
            ts = sorted(times[lbl])
            print(
                f"{lbl}: min {ts[0]:.2f}s  "
                f"reps {'/'.join(f'{t:.2f}' for t in times[lbl])}",
                flush=True,
            )


if __name__ == "__main__":
    main()

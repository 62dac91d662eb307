"""Stage-level decomposition of the LSH maintenance decade cell
(VERDICT r15 next-round task #1): WHERE does q_incremental_minhash_clusters
spend its wall at ×K, and which verify form wins per stage?

The r15 record left a contradiction: the ×30 registered cell read
200 s while the same corpus's full REBUILD read 47 s and the
ingest-only cell 24 s — and the r15 ingest probe's own untimed seed
column read 547 s at ×30 / 1265 s at ×100 vs rebuilds of 47 / 632 s,
even though lsh_seed_state is "~90% of a rebuild" by construction.
Before touching any gate, this probe times the seed's stages one by
one (each ended by its own materialization, labelled in the UI), the
ingest step, and — for the verify stage — BOTH join forms
interleaved, at the same scale in one session:

    python tools/lsh_stage_probe.py [K] [--reps N]

Stages:
  base-prep     digests0 + groups0 checkpoints (fingerprint groupBy)
  base-arrs     shingle arrays checkpoint (+ the size gate's ridden stats)
  index         minhash_index_with_spill's ranked-window checkpoint
  cand          LSH candidate generation alone (noop)
  verify[form]  exact-Jaccard verify (incl. its own cand run) → edges ckpt
  cc            connected_components over the checkpointed edges
  ingest        ONE lsh_maintenance_step + reattachment (noop), per form
Compare against the same-session full rebuild wall printed last.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from end_to_end_datapipeline_project_spark.llm_ops import dedup  # noqa: E402
from end_to_end_datapipeline_project_spark.session import get_spark  # noqa: E402
from end_to_end_datapipeline_project_spark.sources import (  # noqa: E402
    pin_parallelism,
    read_parquet_table,
)
from tools.scale_probe import build  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _t(label: str, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label:42s} {dt:8.2f} s", flush=True)
    return out, dt


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(args[0]) if args else 30
    reps = 1
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_spark("lsh-stage-probe")
    sc = spark.sparkContext
    full = f"/tmp/spark_graft_scale_{os.getuid()}/x{k}"
    sf_dir = (
        full
        if os.path.exists(f"{full}/documents.parquet/_SUCCESS")
        else build(spark, k, ("documents",))
    )
    docs = read_parquet_table(spark, sf_dir, "documents")
    is_delta = F.col("doc_id") % 10 == 7

    for rep in range(reps):
        print(f"=== pass {rep + 1}/{reps} at x{k} ===", flush=True)
        sc.setJobDescription("stage: base-prep")
        base = (
            docs.filter(~is_delta)
            .select("doc_id", dedup.fingerprint_col().alias("fp"), "text")
        )

        def _prep():
            d0 = base.select("doc_id", "fp").localCheckpoint()
            gmin0 = base.groupBy("fp").agg(F.min("doc_id").alias("rep_id"))
            g0 = (
                base.join(gmin0, "fp")
                .filter(F.col("doc_id") == F.col("rep_id"))
                .select("fp", "rep_id", "text")
                .localCheckpoint()
            )
            return d0, g0

        (digests0, groups0), _ = _t("base-prep (digests+groups ckpt)", _prep)

        sc.setJobDescription("stage: base-arrs")
        (base_arrs, base_bytes), _ = _t(
            "base-arrs ckpt (+ridden stats)",
            lambda: dedup.checkpoint_arrs_with_bytes(
                dedup.shingle_arrays(
                    pin_parallelism(
                        groups0.select(
                            F.col("rep_id").alias("doc_id"), "text"
                        ),
                        "doc_id",
                    )
                )
            ),
        )
        print(f"    base_bytes = {base_bytes / (1 << 20):.1f} MB", flush=True)

        sc.setJobDescription("stage: index")
        (idx0_spill0, _), _ = (
            _t(
                "index (ranked window ckpt)",
                lambda: (dedup.minhash_index_with_spill(base_arrs), None),
            )
        )
        idx0, spill0 = idx0_spill0

        sc.setJobDescription("stage: cand")
        _t(
            "cand alone (noop)",
            lambda: _noop(dedup.minhash_candidates(base_arrs)),
        )

        edges_by_form = {}
        for form in ("broadcast", "shuffle"):
            sc.setJobDescription(f"stage: verify[{form}]")
            edges_by_form[form], _ = _t(
                f"verify[{form}] incl cand -> edges ckpt",
                lambda form=form: dedup.verify_candidates(
                    base_arrs,
                    dedup.minhash_candidates(base_arrs),
                    force_form=form,
                )
                .filter(F.col("jaccard") >= dedup.MINHASH_CLUSTER_JACCARD)
                .select(
                    F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                )
                .localCheckpoint(),
            )
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()

        sc.setJobDescription("stage: cc")
        lab0, _ = _t(
            "cc (connected_components)",
            lambda: dedup.connected_components(
                groups0.select(F.col("rep_id").alias("doc_id")),
                edges_by_form["broadcast"],
                "doc_id",
            )
            .select(F.col("doc_id").alias("rep_id"), "cluster_id")
            .localCheckpoint(),
        )

        delta = (
            docs.filter(is_delta)
            .select("doc_id", dedup.fingerprint_col().alias("fp"), "text")
            .localCheckpoint()
        )
        i0, s0 = idx0.localCheckpoint(), spill0.localCheckpoint()
        for form in ("broadcast", "shuffle"):
            sc.setJobDescription(f"stage: ingest[{form}]")
            prev_min, prev_max = dedup.VERIFY_BCAST_MIN, dedup.VERIFY_BCAST_MAX
            if form == "broadcast":
                dedup.VERIFY_BCAST_MIN = 0
            else:
                dedup.VERIFY_BCAST_MIN = 1 << 60
            try:

                def _ingest():
                    obs: dict = {}
                    d2, g2, _i2, _s2, l2 = dedup.lsh_maintenance_step(
                        digests0, groups0, i0, s0, lab0, delta, obs,
                        rep_arrs=base_arrs,
                    )
                    out = (
                        d2.join(g2.select("fp", "rep_id"), "fp")
                        .join(l2, "rep_id")
                        .select(
                            "doc_id",
                            "cluster_id",
                            (F.col("doc_id") == F.col("cluster_id"))
                            .cast("int")
                            .alias("is_canonical"),
                        )
                    )
                    _noop(out)
                    return obs.get("n_pairs_scored", 0)

                pairs, _ = _t(f"ingest[{form}] (maintenance+reattach)", _ingest)
                print(f"    pairs scored = {pairs:,}", flush=True)
            finally:
                dedup.VERIFY_BCAST_MIN = prev_min
                dedup.VERIFY_BCAST_MAX = prev_max
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()

        sc.setJobDescription("stage: full-rebuild (comparison)")
        _t(
            "full rebuild (minhash_cluster_assignments, noop)",
            lambda: _noop(
                dedup.minhash_cluster_assignments(
                    docs.select("doc_id", "text")
                )
            ),
        )
        sc.setJobDescription(None)
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()


if __name__ == "__main__":
    main()

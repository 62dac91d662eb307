"""Scale probe: replicate the sf0.1 tables ×K (disjoint key spaces, same
distributions) into /tmp, run representative queries at both scales, and
record the runtime ratios in SCALING.md.

A plan whose runtime grows ≈K× on K× data is shuffle/scan bound (healthy —
it will ride more executors); super-linear growth flags an operator whose
fan-out or state grows with data size (the thing that kills 100 TB runs).

    python tools/scale_probe.py [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from end_to_end_datapipeline_project_spark.registry import REGISTRY, _load  # noqa: E402
from end_to_end_datapipeline_project_spark.session import get_spark  # noqa: E402
from end_to_end_datapipeline_project_spark.sources import read_parquet_table  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"

#: section header owned by tools/ab_bench.py; scale_probe preserves
#: everything from this line onward when it rewrites SCALING.md
AB_MARKER = "## Interleaved A/B adjudication"

#: section owned by `scale_probe.py K --tail q...`: does cap-bounded
#: growth FLATTEN one decade past x10, or was the quadratic only
#: deferred?  Sits between the ratio table and the A/B appendix; full
#: probe runs preserve it (ab_bench owns everything after AB_MARKER).
TAIL_MARKER = "## Output-bound tail probe"

#: default `--tail` subset: the four output-bound dedup queries whose
#: caps the tail probe exists to audit
TAIL_DEFAULT = (
    "q_fuzzy_match",
    "q_minhash_lsh",
    "q_prefix_filter_join",
    "q_sorted_neighborhood",
)


def _pf_qualifying(spark, sf_dir):
    from end_to_end_datapipeline_project_spark.llm_ops.dedup import (
        prefix_filter_qualifying,
    )

    return prefix_filter_qualifying(spark, sf_dir)


#: intrinsic-WORK probes for emission-capped EXACT queries: the cap
#: bounds what the query RETURNS, but an exact algorithm must still
#: score every qualifying row to rank the cap's survivors, so wall
#: growth is judged against max(data, output, work) — judging a capped
#: exact join on post-cap output alone mislabels intrinsic
#: qualifying-pair growth (measured x10→x30: pre-cap pairs 9.6×, capped
#: output 5.2×) as a deferred quadratic.  Approximate queries
#: (minhash/fuzzy/sorted-neighborhood) have no entry: their caps bound
#: the WORK itself, so post-cap output is the right denominator.
WORK_PROBES = {
    "q_prefix_filter_join": _pf_qualifying,
}

PROBES = [
    "q_daily_report",
    "q_pricing_summary",
    "q_revenue_by_nation",
    "q_sessionize",
    "q_dedup_exact",
    "q_asof_join",
    "q_range_join",
    "q_token_count",
    "q_window_rank",
    "q_salted_join",
    "q_chunk_documents",
    "q_fuzzy_match",
    "q_moving_window",
    "q_user_sequences",
    "q_gopher_repetition",
    "q_pack_sequences",
    "q_decontaminate",
    "q_radius_join",
    "q_pmi_bigrams",
    "q_scd2_history",
    "q_hash_sample",
    "q_kmeans_step",
    "q_pagerank",
    "q_chunk_dedup",
    "q_bm25",
    "q_concurrency",
    "q_zscore_anomaly",
    "q_large_orders",
    "q_logreg_grad",
    "q_quantile_bucketing",
    "q_per_group_sample",
    "q_market_share",
    "q_waiting_suppliers",
    "q_triangle_count",
    "q_label_propagation",
    "q_ohlc_bars",
    "q_ewma",
    "q_pii_scrub",
    "q_quality_classifier",
    "q_oov_rate",
    "q_cdc_compact",
    "q_correlation_matrix",
    "q_naive_bayes",
    "q_prefix_filter_join",
    "q_cdc_chunks",
    "q_pca_power",
    "q_bitmap_distinct",
    "q_event_transitions",
    "q_item_cosine",
    "q_pareto_frontier",
    "q_table_diff",
    "q_info_gain",
    "q_minhash_lsh",
    "q_bpe_merges",
    "q_tfidf",
    "q_script_mix",
    "q_winsorized_stats",
    "q_bigram_logprob",
    "q_ann_hyperplane_lsh",
    "q_mixture_sample",
    "q_quality_calibration",
    "q_boilerplate_scrub",
    "q_hard_negatives",
    "q_minhash_recall",
    "q_ngram_novelty",
    "q_duplicate_spans",
    "q_sorted_neighborhood",
    "q_stay_points",
    "q_trip_segments",
    "q_geofence_transitions",
]

KEY_OFFSETS = {
    # replica i shifts every key column by i * offset → disjoint key spaces,
    # join consistency preserved because both sides shift together
    "events": {"event_id": 10**9, "user_id": 10**4},
    "orders": {"o_orderkey": 10**9, "o_custkey": 10**6},
    "lineitem": {"l_orderkey": 10**9, "l_partkey": 10**6, "l_suppkey": 10**6},
    "customer": {"c_custkey": 10**6, "c_nationkey": 0},
    "supplier": {"s_suppkey": 10**6, "s_nationkey": 0},
    "part": {"p_partkey": 10**6},
    "nation": {},
    "region": {},
    "documents": {"doc_id": 10**7},
    "embeddings": {"vec_id": 10**7},
}


#: ratios that need context: the replica construction makes every doc a
#: member of a k-clique of near-duplicates, so similarity JOIN OUTPUT grows
#: ~k^2 while input grows k — their wall-clock is output-bound, and
#: runtime-per-output-row actually improves at x10.
NOTES = {
    "q_prefix_filter_join": "(output-bound: replica k-cliques make QUALIFYING pairs grow ~x1000; PPJoin asymmetric probe/index prefixes + long-sid array-intersect verify - r8 cut x10 30.5s -> 11.8s and x30 182s -> 47s; remaining growth tracks output) ",
    "q_fuzzy_match": "(output-bound: match pairs grow ~x100 on replica k-cliques; block cap 64 + top-8 emission bound candidates and output linearly once blocks saturate) ",
    "q_minhash_lsh": "(output-bound: replica k-cliques are real near-dups, candidates and output grow ~k^2 by construction; ratio rose 2.2x->3.9x when doc fan-out pinning + signature checkpointing cut the SMALL scale 4.5s->2.0s - absolute x10 wall also improved 10.0s->8.0s; per-(seed,minhash) occupancy cap 1024 bounds chance-collision buckets at billion-doc scale, oracle-mirrored) ",
    "q_ann_hyperplane_lsh": "(12 bands x 4 sign bits, seeded-PRNG hyperplanes, occupancy cap 128 + top-10 emission; measured recall 0.889 vs exact >=0.45 top-10 at sf0.1; 8x2 correlated-weight form measured 4.9x and recall 0.44) ",
    "q_script_mix": "(translate() char-map counts; the 4-regex-pass form measured 4.1x) ",
    "q_pagerank": "(edge-gen bound: dedup-(part,supp)-then-equi-join pair emission [beat the collect_set form in the r5 ab_pagerank A/B, gap widening with scale]; r7 interleaved A/B [tools/ab_pr_forms.py, min of 4, one process] adjudicated the r6 suspicions: rounded-vs-BigDecimal message sum WITHIN NOISE [4.94s vs 5.07s sf0.1, 20.7s vs 21.3s x10] so the r6 batch delta was host noise, and broadcast-vs-shuffle-join rank distribution within noise at x10 for iters 3 and 10 [14.9/13.4s, 22.6/24.1s] - defaults stay rounded+broadcast, the join form is the beyond-broadcast-memory path behind pagerank(broadcast_ranks=False); iterations shuffle only partial-aggregated per-dst message sums, plan-gated in PLANS.md) ",
    "q_label_propagation": "(same edge-gen profile as q_pagerank on the co-order graph; iteration shuffles are the reduced label histogram, winner via partial-agg max_by) ",
    "q_item_cosine": "(linear pair volume: disjoint-key replicas keep basket sizes constant so C(b,2) pairs grow exactly x10 and saturate the fan-out stage; basket cap 64 bounds the quadratic term on pathological baskets) ",
    "q_pricing_summary": "(interleaved in-process A/B measures 1.1x; plan is scan+partial-agg with pushdown - prior 2.9x was host CPU-steal noise) ",
    "q_logreg_grad": "(interleaved A/B 1.2x; dim-keyed allreduce is O(d)-flat - prior 2.9x was host noise) ",
    "q_decontaminate": "(in-row array_distinct shingle dedup replaced the post-explode corpus-wide distinct shuffle; held-out shingle broadcast is fixed-size) ",
    "q_user_sequences": "(pinned grouped-map fan-out: per-group Python work now runs on all 32 cores at BOTH scales, so the ratio is honest linear Python cost on fixed cores - absolute x10 wall improved 3.5s->2.4s vs the unpinned form whose 1.0x ratio just meant both sides underused cores) ",
    "q_pareto_frontier": "(two-level prefix max: within-bucket running max partitions by price bucket [plan-gated hashpartitioning(bkt]; only the ~75-row bucket carry crosses one partition, runtime-gated <=256 rows; sub-second outliers in earlier probes were host noise - interleaved A/B reads 1.0x) ",
    "q_scd2_history": "(sub-second query: batch-probe 2.5x was host noise, interleaved A/B reads 1.0x) ",
    "q_bm25": "(single-scan rewrite: doclen + per-term tfs from ONE groupBy(doc_id) with conditional counts + stack unpivot; the lazy tf/df/dl branch form re-ran the scan+explode up to 4x) ",
    "q_concurrency": "(explode-of-array boundary points: one event scan per consumer instead of a 2-scan union) ",
    "q_triangle_count": "(degree-ordered orientation: wedge work bounded O(E^1.5) under hub skew; slightly pricier edge prep at uniform degree) ",
    "q_hard_negatives": "(LSH band prefilter replaced the per-anchor-batch BNLJ corpus rescan: anchor band signatures broadcast, only same-bucket vectors cosine-scored; measured recall vs exact BNLJ ground truth 0.775 at sf0.1) ",
    "q_bpe_merges": "(vocab-cap-bounded trainer: corpus tokenize+count is the only data-sized stage, iterations run on the capped word table - ratio ~1.0x by design) ",
    "q_sorted_neighborhood": "(output-bound per the rows column: replica ' replica{i}' suffixes leave 16-char probes identical across replicas, so qualifying neighbor pairs grow ~330x while input grows 10x; rank windows are bucket-partitioned with a two-level prefix sum for bases) ",
}


def build(spark, k: int) -> str:
    from end_to_end_datapipeline_project_spark.sources import claim_staged

    out = f"/tmp/spark_graft_scale_{os.getuid()}/x{k}"

    def _build(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        for table, offsets in KEY_OFFSETS.items():
            df = read_parquet_table(spark, BASE_SF, table)
            if table in ("nation", "region"):
                big = df  # dimension lookups: keep identical
            else:
                reps = []
                for i in range(k):
                    r = df
                    for col, off in offsets.items():
                        if off:
                            r = r.withColumn(col, F.col(col) + F.lit(i * off))
                    if table == "documents":
                        # vary text across replicas so near-dup structure
                        # stays ~constant per replica instead of creating
                        # k-cliques.  APPEND the marker: a prepended one
                        # gave every doc in a replica the same leading 8
                        # chars, collapsing all prefix-blocked queries
                        # into one giant block — probe artifact, not a
                        # property of the data distribution.  n_chars is
                        # refreshed to keep the length(text) == n_chars
                        # invariant the base data satisfies.
                        r = r.withColumn(
                            "text",
                            F.concat(F.col("text"), F.lit(f" replica{i}")),
                        ).withColumn("n_chars", F.length("text").cast("long"))
                    reps.append(r)
                big = reps[0]
                for r in reps[1:]:
                    big = big.unionByName(r)
            big.write.mode("overwrite").parquet(f"{tmp}/{table}.parquet")

    # atomic build-once publish (claim_staged): two concurrent probe /
    # bench processes must never overwrite each other mid-build
    claim_staged(out, _build)
    return out


def _tail_probe(spark, run, k: int, big_dir: str, names: list) -> None:
    """One decade past the standard probe: time each query at ×10 AND
    ×K (default 30) and compare WALL growth to OUTPUT growth over the
    ×10→×K step.  For the output-bound queries (candidate pairs grow
    with replica k-cliques), a healthy cap means wall tracks
    max(output, data) growth; wall outgrowing both flags a quadratic
    that the cap only deferred.  Rewrites the TAIL_MARKER section of
    SCALING.md, preserving the ratio table before it and the A/B
    appendix after it."""
    x10_dir = build(spark, 10)
    run("q_pricing_summary", x10_dir)
    run("q_pricing_summary", big_dir)
    rows_out = [
        TAIL_MARKER,
        "",
        f"`python tools/scale_probe.py {k} --tail ...` — ×10 vs ×{k} "
        f"(data grows {k / 10:.0f}×; min of 2 per cell).  Verdict rule: "
        "wall growth ≤ 1.25 × max(data growth, output growth, work "
        "growth) ⇒ the candidate caps bound the tail; above that ⇒ the "
        "quadratic was deferred, not removed.  `work rows` (only for "
        "emission-capped EXACT queries, see WORK_PROBES) counts the "
        "pre-cap qualifying rows the algorithm must score to rank the "
        "cap's survivors — for those queries post-cap output "
        "understates intrinsic growth by construction.",
        "",
        f"| query | ×10 (s) | ×{k} (s) | wall ×{k}/×10 | "
        f"out rows ×10→×{k} | work rows ×10→×{k} | verdict |",
        "|---|---|---|---|---|---|---|",
    ]
    data_ratio = k / 10
    for name in names:
        r10 = [run(name, x10_dir) for _ in range(2)]
        rk = [run(name, big_dir) for _ in range(2)]
        t10, tk = min(t for t, _ in r10), min(t for t, _ in rk)
        n10, nk = r10[0][1], rk[0][1]
        wall = tk / t10 if t10 > 0 else float("inf")
        out_ratio = nk / n10 if n10 else float("inf")
        work_cell, work_ratio = "—", 0.0
        if name in WORK_PROBES:
            w10 = WORK_PROBES[name](spark, x10_dir).count()
            wk = WORK_PROBES[name](spark, big_dir).count()
            work_ratio = wk / w10 if w10 else float("inf")
            work_cell = f"{w10}→{wk} ({work_ratio:.1f}×)"
        bound = 1.25 * max(data_ratio, out_ratio, work_ratio)
        verdict = (
            "caps hold: wall tracks output/work/data"
            if wall <= bound
            else "SUPER-LINEAR TAIL — cap deferred the quadratic"
        )
        rows_out.append(
            f"| {name} | {t10:.2f} | {tk:.2f} | {wall:.1f}× | "
            f"{n10}→{nk} ({out_ratio:.1f}×) | {work_cell} | {verdict} |"
        )
        print(rows_out[-1], flush=True)
    path = "/root/repo/SCALING.md"
    doc = open(path).read()
    appendix = ""
    if AB_MARKER in doc:
        appendix = doc[doc.index(AB_MARKER) :]
        doc = doc[: doc.index(AB_MARKER)]
    if TAIL_MARKER in doc:
        doc = doc[: doc.index(TAIL_MARKER)]
    with open(path, "w") as f:
        f.write(
            doc.rstrip()
            + "\n\n"
            + "\n".join(rows_out)
            + "\n\n"
            + appendix
        )
    print(f"tail section written to {path}")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    subset = sys.argv[2:]  # subset run: print ratios, keep SCALING.md intact
    tail = False
    if "--tail" in subset:  # subset run that WRITES the tail section
        subset.remove("--tail")
        tail = True
        if not subset:
            # bare `--tail` defaults to the output-bound probe set
            # rather than rewriting the tail section to an empty table
            # (ADVICE r7)
            subset = list(TAIL_DEFAULT)
    _load()
    spark = get_spark("scale-probe")
    big_dir = build(spark, k)

    def run(name: str, sf_dir: str) -> tuple[float, int]:
        # Observation rides the same noop write — output-row counts cost
        # no extra pass, and make "output-bound" ratio claims checkable
        # (rows_small -> rows_big printed beside the wall ratio)
        from pyspark.sql import Observation

        obs = Observation()
        t0 = time.time()
        REGISTRY[name].spark_fn(spark, sf_dir).observe(
            obs, F.count(F.lit(1)).alias("rows")
        ).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        rows = obs.get["rows"]
        # queries that persist()/localCheckpoint() intermediates pin
        # executor memory; without cleanup those RDDs survive into the
        # NEXT query's timing and skew it with GC/spill pressure.
        # ContextCleaner frees checkpoint blocks only after a JVM GC —
        # Python gc alone never triggers one (same fix as bench.py)
        import gc

        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        return dt, rows

    if tail:
        _tail_probe(spark, run, k, big_dir, subset)
        return

    # warm both datasets' footers + codegen with one cheap query each
    run("q_pricing_summary", BASE_SF)
    run("q_pricing_summary", big_dir)

    lines = [
        "# SCALING — measured runtime growth on ×%d data" % k,
        "",
        f"`python tools/scale_probe.py {k}` replicates sf0.1 ×{k} with disjoint",
        "key spaces (≈6M lineitem rows) and compares per-query runtimes.",
        "ratio ≈ K ⇒ scan/shuffle-bound (healthy: more executors absorb it);",
        "ratio ≫ K ⇒ super-linear fan-out or state — a 100 TB red flag.",
        "",
        "| query | sf0.1 (s) | ×%d (s) | ratio (ideal ≈%d) | out rows sf0.1→×%d |" % (k, k, k),
        "|---|---|---|---|---|",
    ]
    for name in subset or PROBES:
        runs_small = [run(name, BASE_SF) for _ in range(2)]
        runs_big = [run(name, big_dir) for _ in range(2)]
        t_small = min(t for t, _ in runs_small)
        t_big = min(t for t, _ in runs_big)
        rows_small, rows_big = runs_small[0][1], runs_big[0][1]
        ratio = t_big / t_small if t_small > 0 else float("inf")
        rows_ratio = rows_big / rows_small if rows_small else float("inf")
        note = NOTES.get(name, "")
        lines.append(
            f"| {name} | {t_small:.2f} | {t_big:.2f} | {ratio:.1f}× {note}| "
            f"{rows_small}→{rows_big} ({rows_ratio:.1f}×) |"
        )
        print(lines[-1], flush=True)
    if subset:
        print("(subset run: SCALING.md not rewritten)")
        return
    # preserve the ×K tail section (this tool's --tail mode) and the
    # interleaved-A/B adjudication appendix (tools/ab_bench.py) — the
    # full probe owns only the ratio table
    appendix = ""
    try:
        old = open("/root/repo/SCALING.md").read()
        marks = [old.index(m) for m in (TAIL_MARKER, AB_MARKER) if m in old]
        if marks:
            appendix = "\n" + old[min(marks):]
    except OSError:
        pass
    with open("/root/repo/SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n" + appendix)
    print("SCALING.md written")


if __name__ == "__main__":
    main()

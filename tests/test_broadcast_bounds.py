"""Broadcast-size boundedness gate: every EXPLICIT ``F.broadcast()``
hint ships its table to every executor, so each hinted side must be
provably bounded — dimensions, model vectors, anchor sets, per-source
stats — never a corpus-sized table (the round-4 q_hard_negatives bug:
the cosine-verify side broadcast ALL embeddings instead of the 8
anchors; review caught it, this gate would have).

Method: auto-broadcast is disabled for the probe session
(``autoBroadcastJoinThreshold = -1`` both planner- and AQE-side), so
every ``BroadcastExchange`` left in the executed plan comes from an
explicit hint — AQE's opportunistic broadcasts of small-at-sf0.01 fact
tables (which become sort-merge joins at scale) never flake the gate.
Each exchange's ACTUAL ``numOutputRows`` metric is then asserted under
the query's documented ceiling, mirroring tests/test_window_bounds.py.
"""

import pytest

from end_to_end_datapipeline_project_spark.registry import all_queries


def broadcast_exchange_rows(df) -> list:
    """Execute df and return numOutputRows of every distinct (non-reused)
    BroadcastExchange in the executed plan."""
    df.collect()
    out = []
    seen = set()

    def metric(node):
        m = node.metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numOutputRows":
                return kv._2().value()
        return None

    def walk(node):
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
        if "BroadcastExchange" in name and "Reused" not in name:
            if node.id() not in seen:
                seen.add(node.id())
                out.append(metric(node))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        try:  # query stages hide their subtree in .plan()
            walk(node.plan())
        except Exception:
            pass

    walk(df._jdf.queryExecution().executedPlan())
    return out


#: per-query ceiling on rows in ANY explicitly-hinted broadcast, at the
#: sf0.01 test fixture.  Measured values (2026-08, auto-broadcast off)
#: in the comments; ceilings carry 4-10x headroom over the design bound
#: so plan jitter cannot flake them, yet sit orders of magnitude below
#: the corpus-sized table an unbounded regression would broadcast.
BOUNDED_BROADCASTS = {
    # TPC-H-style dim legs: customer 1500 + nation 25 + region 1
    "q_revenue_by_nation": 8_000,
    # seven dim legs, largest = customer 1500
    "q_market_share": 8_000,
    # supplier 100 + nation 1
    "q_waiting_suppliers": 1_024,
    # rank/outdeg vectors: O(V), V = |suppliers| = 100
    "q_pagerank": 1_024,
    # label vector: O(V), V = 1880 co-order items
    "q_label_propagation": 8_192,
    # anchors-only: 8 anchors x 12 bands = 96, anchors qa = 8.  The
    # round-4 O(corpus) regression reads |embeddings| = 500 here -> red
    "q_hard_negatives": 128,
    # per-source probability/threshold tables: |sources| = 20
    "q_mixture_sample": 64,
    "q_quality_calibration": 64,
    # O(k) category stats: k = 5 brands
    "q_target_encoding": 64,
    # held-out eval shingle set: 258 (fixed eval split, not corpus-sized)
    "q_decontaminate": 2_048,
    # top-1 vehicle semi-join keys
    "q_drilldown_top_vehicle": 16,
    # 64 centroids
    "q_kmeans_step": 256,
    # corpus-level scalars (avgdl, N, df aggregate): 3 rows
    "q_bm25": 64,
    # repeated-line fingerprint set: 15 (grows with distinct boilerplate
    # lines above the repeat threshold, not with corpus rows)
    "q_boilerplate_scrub": 4_096,
    # oriented edge list: O(E) BY DESIGN (documented wedge-probe shape,
    # E(sf0.01) = 3445); the ceiling still catches a regression to
    # broadcasting wedge PAIRS (O(E^1.5), ~200k here)
    "q_triangle_count": 16_384,
    # 32 seed centroids (fixed k)
    "q_semdedup": 256,
    # hashed-unigram LM table: ≤ B = 1024 buckets by construction + the
    # 1-row totals frame (measured 30 + 1 on the small-vocab fixture)
    "q_dsir_select": 4_096,
    # pivoted token→k-terms model: O(vocab) BY DESIGN (vocab = 31 on the
    # fixture; at open-vocab corpus scale the model join must flip to a
    # shuffle join — documented in the query).  The ceiling catches the
    # regression class of broadcasting the token STREAM (~50k rows at
    # sf0.01) instead of the model
    "q_naive_bayes": 16_384,
}


@pytest.fixture(scope="module")
def no_auto_broadcast(spark):
    planner = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", planner)
    if aqe is None:
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    else:
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", aqe)


@pytest.mark.parametrize("qname", sorted(BOUNDED_BROADCASTS))
def test_explicit_broadcast_is_bounded(no_auto_broadcast, sf_dir, qname):
    ceiling = BOUNDED_BROADCASTS[qname]
    df = all_queries()[qname](no_auto_broadcast, sf_dir)
    for rows in broadcast_exchange_rows(df):
        assert rows is not None and rows <= ceiling, (
            f"{qname}: explicit broadcast shipped {rows} rows "
            f"(> ceiling {ceiling}) — a corpus-sized broadcast is the "
            "round-4 q_hard_negatives bug class; bound the hinted side"
        )

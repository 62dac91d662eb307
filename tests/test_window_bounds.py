"""Unpartitioned-window boundedness gate: every ``Window`` physical node
with an EMPTY partition spec funnels its whole input through ONE task, so
each such window in the repo must provably touch a bounded (constant or
deeply sublinear) number of rows — super-bucket tables, price-range
buckets, per-day aggregates, top-k partial-limit survivors.

This test measures the ACTUAL input row count of every unpartitioned
WindowExec from the executed plan's metrics (the feeding exchange's
shuffle records, or the nearest descendant's output-rows metric) and
fails if any exceeds its documented ceiling — so a future edit cannot
silently unbound one (the round-3 scale bug class).

``WindowGroupLimit`` nodes are exempt by construction: their *Partial*
instance runs per input partition (parallel), and the Final instance's
input is already capped at k × partitions by the partial pass.
"""

import pytest

from end_to_end_datapipeline_project_spark.registry import all_queries


def _metric_rows(node):
    """Nearest descendant metric that reports the subtree's output rows."""
    m = node.metrics()
    it = m.iterator()
    vals = {}
    while it.hasNext():
        kv = it.next()
        vals[kv._1()] = kv._2().value()
    for key in ("shuffleRecordsWritten", "numOutputRows"):
        if key in vals:
            return vals[key]
    ch = node.children()
    for i in range(ch.size()):
        r = _metric_rows(ch.apply(i))
        if r is not None:
            return r
    try:  # query stages / reused exchanges hide their subtree in .plan()
        return _metric_rows(node.plan())
    except Exception:
        return None


def unpartitioned_window_inputs(df) -> list:
    """Execute df and return the measured input row count of every
    WindowExec whose partition spec is empty (None when the plan carries
    no row metric below the window — e.g. a bare local limit)."""
    df.collect()
    out = []

    def walk(node):
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
        if name == "Window" and node.partitionSpec().size() == 0:
            ch = node.children()
            out.append(_metric_rows(ch.apply(0)) if ch.size() else None)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        try:
            walk(node.plan())
        except Exception:
            pass

    walk(df._jdf.queryExecution().executedPlan())
    return out


#: every query in the repo that intentionally uses a global window, with
#: the ceiling its design guarantees at sf0.01 (and the reason).  The
#: ceilings are deliberately generous vs the design bound so host-side
#: plan jitter cannot flake them, yet orders of magnitude below the
#: data-sized row counts an unbounded regression would produce.
BOUNDED_GLOBAL_WINDOWS = {
    # presentation re-rank over a LIMIT 10 frame
    "q_chart_top10_costs": 64,
    # single drilled-down vehicle's one-day pings (entity-bounded)
    "q_route_map_path": 10_000,
    # per-day carry table: |distinct days in events| (~31)
    "q_concurrency": 1_000,
    # daily revenue series: |distinct order dates| (~2400)
    "q_acf": 5_000,
    # two-level prefix max: cross-bucket carry over ~75 price buckets
    "q_pareto_frontier": 256,
    # per-source aggregate tables: |sources| (~5)
    "q_source_mix": 64,
    "q_mixture_sample": 64,
    # top-20 via WindowGroupLimit: Final input ≤ 20 × partitions
    "q_pmi_bigrams": 20 * 64,
    # vocab rank k=1000: Final input ≤ VOCAB_K × partitions
    "q_build_vocab": 1000 * 64,
    # sorted-neighborhood super-bucket bases: ≤ charset² prefix rows
    "q_sorted_neighborhood": 4_096,
    # pack_sequences bucket-of-buckets bases: n/10⁶ super-bucket rows
    "q_pack_sequences": 64,
}


@pytest.mark.parametrize("qname", sorted(BOUNDED_GLOBAL_WINDOWS))
def test_unpartitioned_window_input_is_bounded(spark, sf_dir, qname):
    ceiling = BOUNDED_GLOBAL_WINDOWS[qname]
    df = all_queries()[qname](spark, sf_dir)
    measured = unpartitioned_window_inputs(df)
    for rows in measured:
        if rows is None:
            # no row metric below the window (local-only input): the
            # result itself must then be within the ceiling
            assert df.count() <= ceiling, qname
        else:
            assert rows <= ceiling, (
                f"{qname}: unpartitioned window consumed {rows} rows "
                f"(> ceiling {ceiling}) — a data-sized global window "
                "is the round-3 scale-bug class; re-bucket it"
            )


def test_no_unlisted_global_window_queries():
    """Source-level tripwire: any NEW Window.orderBy(...)/partitionBy()
    call site must either live in a query listed above (with a ceiling)
    or extend this allowlist consciously."""
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parents[1] / (
        "end_to_end_datapipeline_project_spark"
    )
    pat = re.compile(r"Window\s*\.\s*(?:orderBy|partitionBy\(\))")
    sites = []
    for py in sorted(pkg.rglob("*.py")):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if pat.search(line) and not line.lstrip().startswith("#"):
                sites.append(f"{py.name}:{i}")
    # the known, audited call sites (update together with the ceilings
    # table above and the file's design comment when adding one)
    expected = {
        "pipeline_queries.py": 4,  # chart re-rank, route path (2), concurrency
        "timeseries.py": 1,  # acf day series
        "relational.py": 1,  # pareto bucket carry
        "dedup.py": 1,  # sorted-neighborhood super-bucket bases
        "clean.py": 3,  # pack bases + source-mix + mixture shares
        "text.py": 2,  # pmi top-k, vocab rank
    }
    got: dict = {}
    for s in sites:
        got[s.split(":")[0]] = got.get(s.split(":")[0], 0) + 1
    assert got == expected, (
        f"unpartitioned-window call sites changed: {sites} — audit the "
        "new site's input bound and update BOUNDED_GLOBAL_WINDOWS + "
        "this allowlist"
    )

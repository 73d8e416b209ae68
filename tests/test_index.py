"""Inverted index: search semantics + pushed-down term filters."""

from __future__ import annotations

from pyspark.sql import Row

from lakeflow.operators.index import (
    build_inverted_index,
    keyword_search_all,
    keyword_search_any,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma alpha"),
            Row(doc_id=2, text="beta gamma"),
            Row(doc_id=3, text="Alpha  beta\nalpha"),  # case + whitespace runs
            Row(doc_id=4, text="delta"),
        ]
    )


def test_index_tf_counts(spark):
    idx = build_inverted_index(_docs(spark))
    got = {(r["token"], r["doc_id"]): r["tf"] for r in idx.collect()}
    assert got[("alpha", 1)] == 2 and got[("alpha", 3)] == 2
    assert got[("beta", 2)] == 1 and ("delta", 4) in got


def test_conjunctive_search(spark):
    idx = build_inverted_index(_docs(spark))
    hits = {r["doc_id"]: r["total_tf"] for r in
            keyword_search_all(idx, ["ALPHA", "beta"]).collect()}
    assert hits == {1: 3, 3: 3}  # docs with both terms; tf summed over terms


def test_disjunctive_search_min_terms(spark):
    idx = build_inverted_index(_docs(spark))
    any1 = {r["doc_id"] for r in keyword_search_any(idx, ["gamma", "delta"]).collect()}
    assert any1 == {1, 2, 4}
    any2 = {r["doc_id"] for r in
            keyword_search_any(idx, ["alpha", "beta", "gamma"], min_terms=3).collect()}
    assert any2 == {1}


def test_term_filter_pushed_to_persisted_index(spark, tmp_path):
    # the 100 TB path: index persisted, term lookup must prune at the scan
    path = str(tmp_path / "idx")
    build_inverted_index(_docs(spark)).write.parquet(path)
    idx = spark.read.parquet(path)
    plan = (
        keyword_search_all(idx, ["alpha", "beta"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [In(token" in plan


def test_conjunctive_search_dedupes_terms(spark):
    idx = build_inverted_index(_docs(spark))
    # duplicate + case-variant terms collapse to one unique token;
    # previously count_distinct could never reach len(terms) -> empty
    hits = {r["doc_id"] for r in
            keyword_search_all(idx, ["alpha", "Alpha", "ALPHA"]).collect()}
    assert hits == {1, 3}

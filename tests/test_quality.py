from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.operators.quality import QualityError, enforce, run_checks

SF = "/root/testdata/sf0.001"


def test_checks_pass_on_clean_table(spark):
    orders = load_table(spark, SF, "orders")
    results = run_checks(
        orders,
        not_null=["o_orderkey", "o_custkey"],
        unique=["o_orderkey"],
        min_rows=100,
        accepted_values={"o_orderstatus": ["O", "F", "P"]},
        custom={"positive_price": F.col("o_totalprice") > 0},
    )
    assert all(r.passed for r in results), [r for r in results if not r.passed]
    enforce(results)  # no raise


def test_checks_fail_and_enforce_raises(spark):
    df = spark.createDataFrame(
        [Row(k=1, s="ok"), Row(k=1, s="dup"), Row(k=None, s="bad")]
    )
    results = {r.name: r for r in run_checks(
        df,
        not_null=["k"],
        unique=["k"],
        min_rows=10,
        accepted_values={"s": ["ok"]},
    )}
    assert not results["not_null:k"].passed
    assert not results["unique:k"].passed
    assert not results["min_rows"].passed
    assert not results["accepted_values:s"].passed
    with pytest.raises(QualityError) as e:
        enforce(list(results.values()))
    assert "not_null:k" in str(e.value)


def test_unique_check_null_safe(spark):
    # all-distinct keys including a NULL: count_distinct over bare
    # columns would drop the NULL row and falsely report a duplicate
    df = spark.createDataFrame([Row(k=1), Row(k=2), Row(k=None)])
    res = {r.name: r for r in run_checks(df, unique=["k"])}
    assert res["unique:k"].passed, res["unique:k"].detail


def test_unique_check_two_nulls_are_duplicates(spark):
    # pinned semantics: struct equality treats NULL == NULL, so two
    # all-NULL keys are duplicates (stricter than SQL UNIQUE, which
    # admits multiple NULLs) — see run_checks docstring
    df = spark.createDataFrame([Row(k=1), Row(k=None), Row(k=None)])
    res = {r.name: r for r in run_checks(df, unique=["k"])}
    assert not res["unique:k"].passed
    assert "1 duplicate" in res["unique:k"].detail


def test_custom_check_null_condition_is_violation(spark):
    # v > 0 on a NULL v evaluates to NULL; sum() skips NULLs, so the
    # naive form silently passes — NULL must count as a violation
    df = spark.createDataFrame([Row(v=5), Row(v=None)])
    res = {
        r.name: r
        for r in run_checks(df, custom={"v_pos": F.col("v") > 0})
    }
    assert not res["custom:v_pos"].passed
    assert "1 violation" in res["custom:v_pos"].detail


def test_gopher_rules_signals_and_verdict(spark):
    from pyspark.sql import Row

    from lakeflow.operators.text import gopher_rules

    good = " ".join(["the quick brown fox jumps over that lazy dog with style"] * 6)
    bullets = "\n".join(["- item one here now", "- item two here now", "* item three"])
    salad = " ".join(["zq9#"] * 60)  # no alphabetic-majority, no stopwords
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=good),
            Row(doc_id=2, text=bullets),
            Row(doc_id=3, text=salad),
        ]
    )
    out = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    r1 = out[1]
    assert r1["passes_gopher"] and r1["n_words"] == 66
    assert 3_000_000 <= r1["mean_word_len_micros"] <= 10_000_000
    assert r1["stop_distinct"] >= 2
    # all-bullet doc fails the bullet-line fraction (and word count)
    r2 = out[2]
    assert r2["bullet_micros"] == 1_000_000 and not r2["passes_gopher"]
    # symbol salad: has alpha chars ('z','q') so alpha passes, but zero
    # common words and word count fine -> fails on stop_distinct
    r3 = out[3]
    assert r3["stop_distinct"] == 0 and not r3["passes_gopher"]

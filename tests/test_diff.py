"""Snapshot diff: op classification, null semantics, and the
round-trip property (old + feed == new)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from lakeflow.operators.diff import snapshot_diff


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, a=a, b=b) for k, a, b in rows],
        schema="k long, a string, b long",
    )


def test_ops_classified(spark):
    old = _df(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30)])
    new = _df(spark, [(1, "x", 10), (2, "y", 99), (4, "w", 40)])
    got = {r["k"]: r["op"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: "U", 3: "D", 4: "I"}  # key 1 unchanged: no row


def test_null_semantics(spark):
    old = _df(spark, [(1, None, 10), (2, "y", None)])
    new = _df(spark, [(1, None, 10), (2, "y", 5)])
    got = {r["k"]: r["op"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: "U"}  # NULL == NULL is unchanged; NULL -> value is U


def test_values_carried(spark):
    old = _df(spark, [(1, "x", 10), (2, "y", 20)])
    new = _df(spark, [(2, "y2", 21), (3, "z", 30)])
    rows = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert (rows[1]["a"], rows[1]["b"]) == ("x", 10)  # D carries OLD values
    assert (rows[2]["a"], rows[2]["b"]) == ("y2", 21)  # U carries NEW values
    assert (rows[3]["a"], rows[3]["b"]) == ("z", 30)  # I carries NEW values


def test_round_trip_old_plus_feed_is_new(spark):
    old = _df(
        spark,
        [(i, f"v{i % 5}", i * 3) for i in range(200)],
    )
    new = _df(
        spark,
        [(i, f"v{(i + (i % 7 == 0)) % 5}", i * 3 + (i % 11 == 0))
         for i in range(20, 230)],
    )
    feed = snapshot_diff(old, new, ["k"])
    upserts = feed.where(F.col("op") != "D").drop("op")
    deletes = feed.where(F.col("op") == "D").select("k")
    touched = feed.select("k")
    rebuilt = (
        old.join(touched, "k", "left_anti")  # untouched survive
        .unionByName(upserts)
    )
    assert deletes.join(rebuilt, "k", "inner").count() == 0
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_null_key_rows(spark):
    # all-NULL keys are real rows: unchanged emits nothing, a removed
    # NULL-key row is a D (not a phantom I), values carried correctly
    old = _df(spark, [(None, "x", 10), (1, "y", 20)])
    new = _df(spark, [(None, "x", 10), (1, "y", 21)])
    got = {r["k"]: r["op"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "U"}  # the unchanged NULL-key row emits no feed row
    gone = snapshot_diff(old, _df(spark, [(1, "y", 20)]), ["k"]).collect()
    assert [(r["op"], r["k"], r["a"], r["b"]) for r in gone] == [
        ("D", None, "x", 10)
    ]
    ins = snapshot_diff(_df(spark, []), old, ["k"]).collect()
    assert {(r["op"], r["k"], r["b"]) for r in ins} == {
        ("I", None, 10), ("I", 1, 20)
    }

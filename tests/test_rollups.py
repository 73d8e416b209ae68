"""Mergeable rollups + stratified exact-k sampling."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from lakeflow.operators.rollups import hourly_partials, merge_to_grain
from lakeflow.operators.sampling import stratified_exact_k


def _events(spark, n=500):
    base = datetime.datetime(2024, 3, 1)
    rows = [
        Row(
            ts=base + datetime.timedelta(minutes=7 * i),
            k="a" if i % 3 else "b",
            v=i,
            u=f"u{i % 37}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_additive_measures_merge_exactly(spark):
    ev = _events(spark)
    partials = hourly_partials(ev, "ts", ["k"], F.col("v"), "u")
    daily = merge_to_grain(partials, ["k"], "day")
    direct = ev.groupBy(
        "k", F.date_trunc("day", "ts").alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sum_v"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )
    got = {
        (r["k"], r["bucket_start"]): (r["n"], r["sum_v"], r["min_ts"], r["max_ts"])
        for r in daily.collect()
    }
    want = {
        (r["k"], r["bucket_start"]): (r["n"], r["sum_v"], r["min_ts"], r["max_ts"])
        for r in direct.collect()
    }
    assert got == want


def test_merged_sketch_matches_single_pass_estimate(spark):
    # union over hourly sketches must equal one sketch of the whole day
    ev = _events(spark)
    partials = hourly_partials(ev, "ts", ["k"], F.col("v"), "u")
    merged = {
        (r["k"], r["bucket_start"]): r["distinct_est"]
        for r in merge_to_grain(partials, ["k"], "day").collect()
    }
    single = {
        (r["k"], r["b"]): r["est"]
        for r in ev.groupBy("k", F.date_trunc("day", "ts").alias("b"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("u").cast("string"), F.lit(12))
            ).alias("est")
        )
        .collect()
    }
    assert merged == single


def test_rollup_estimate_error_contract(spark):
    ev = _events(spark, n=2000)
    partials = hourly_partials(ev, "ts", ["k"], F.col("v"), "u")
    daily = merge_to_grain(partials, ["k"], "day")
    exact = ev.groupBy(
        "k", F.date_trunc("day", "ts").alias("bucket_start")
    ).agg(F.count_distinct("u").alias("exact"))
    for r in daily.join(exact, ["k", "bucket_start"]).collect():
        assert abs(r["distinct_est"] - r["exact"]) <= max(1, 0.05 * r["exact"])


def test_stratified_exact_k_counts_and_nesting(spark):
    df = spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("g"),
        F.col("id").cast("string").alias("key"),
    )
    s5 = stratified_exact_k(df, "g", "key", 5)
    counts = {r["g"]: r["count"] for r in s5.groupBy("g").count().collect()}
    assert counts == {str(i): 5 for i in range(7)}
    # nested: the k=3 sample is a subset of the k=5 sample per group
    s3 = set(map(tuple, stratified_exact_k(df, "g", "key", 3).collect()))
    assert s3 <= set(map(tuple, s5.collect()))


def test_stratified_exact_k_partitioning_invariance(spark):
    df = spark.range(500).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").cast("string").alias("key"),
    )
    a = sorted(map(tuple, stratified_exact_k(df.repartition(2), "g", "key", 6).collect()))
    b = sorted(map(tuple, stratified_exact_k(df.repartition(11), "g", "key", 6).collect()))
    assert a == b


def test_bitmap_rollup_is_exact(spark):
    from lakeflow.operators.rollups import (
        hourly_bitmap_partials,
        merge_bitmap_to_grain,
    )

    ev = _events(spark, n=1500).withColumn(
        "uid", F.abs(F.hash("u")) % 100_000  # spread across bitmap buckets
    )
    partials = hourly_bitmap_partials(ev, "ts", ["k"], "uid")
    daily = merge_bitmap_to_grain(partials, ["k"], "day")
    exact = ev.groupBy("k", F.date_trunc("day", "ts").alias("bucket_start")).agg(
        F.count(F.lit(1)).alias("n"), F.count_distinct("uid").alias("d")
    )
    got = {
        (r["k"], r["bucket_start"]): (r["n"], r["distinct_exact"])
        for r in daily.collect()
    }
    want = {(r["k"], r["bucket_start"]): (r["n"], r["d"]) for r in exact.collect()}
    assert got == want


def test_shard_write_and_manifest(spark, tmp_path):
    from lakeflow.sinks.shards import shard_manifest, with_shard, write_training_shards

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13).alias("v")
    )
    path = str(tmp_path / "shards")
    manifest = write_training_shards(df, path, "doc_id", 4)
    rows = {r["shard"]: r for r in manifest.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert sum(r["n_rows"] for r in rows.values()) == 2000
    # balance: uniform hash → each shard within ±30% of the mean
    for r in rows.values():
        assert 350 <= r["n_rows"] <= 650
    # determinism: reread one shard dir == recomputed assignment
    s2 = {
        r["doc_id"]
        for r in spark.read.parquet(f"{path}/shard=2").select("doc_id").collect()
    }
    want = {
        r["doc_id"]
        for r in with_shard(df, "doc_id", 4).where(F.col("shard") == 2).collect()
    }
    assert s2 == want
    # manifest from listing matches the returned one
    again = {r["shard"]: r["n_rows"] for r in shard_manifest(spark, path).collect()}
    assert again == {k: r["n_rows"] for k, r in rows.items()}


def test_one_file_per_shard(spark, tmp_path):
    from lakeflow.sinks.shards import write_training_shards

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    path = str(tmp_path / "shards1f")
    manifest = write_training_shards(
        df, path, "doc_id", 3, one_file_per_shard=True
    )
    assert all(r["n_files"] == 1 for r in manifest.collect())

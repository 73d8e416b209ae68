"""Bloom join pruning + zone-map file skipping: exactness vs the
unpruned plan, real pruning measured, and no-Python plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.operators.bloom import (
    bloom_bits_for,
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
)
from lakeflow.sinks.zonemap import (
    build_zonemap_table,
    prune_files,
    pruned_read,
    pruned_read_with_index,
    zonemap_from_footers,
)

SF = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives(spark):
    dim = spark.range(1000).select(F.col("id").alias("k"))
    n_bits = bloom_bits_for(1000)
    words = bloom_build(dim, "k", n_bits)
    hits = dim.where(bloom_might_contain("k", words, n_bits)).count()
    assert hits == 1000  # every member must pass — guaranteed, not probabilistic


def test_bloom_false_positive_rate_bounded(spark):
    dim = spark.range(1000).select(F.col("id").alias("k"))
    n_bits = bloom_bits_for(1000)
    words = bloom_build(dim, "k", n_bits)
    probes = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    fp = probes.where(bloom_might_contain("k", words, n_bits)).count()
    # 10 bits/key, 5 hashes → theoretical ~1%; assert a loose 5% bound
    assert fp / 20_000 < 0.05


def test_bloom_semi_join_matches_plain(spark):
    li = load_table(spark, SF, "lineitem")
    dim = (
        load_table(spark, SF, "part")
        .where(F.col("p_size") <= 2)
        .select("p_partkey")
    )
    plain = (
        li.join(dim, li["l_partkey"] == dim["p_partkey"], "left_semi")
        .groupBy("l_returnflag")
        .count()
    )
    pruned = bloom_semi_join(li, dim, "l_partkey", "p_partkey").groupBy(
        "l_returnflag"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, pruned.collect())
    )


def test_bloom_probe_plan_is_codegen(spark):
    dim = spark.range(100).select(F.col("id").alias("k"))
    n_bits = bloom_bits_for(100)
    words = bloom_build(dim, "k", n_bits)
    fact = spark.range(10_000).select(F.col("id").alias("k"))
    plan = (
        fact.where(bloom_might_contain("k", words, n_bits))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan  # the probe is pure JVM expression code
    assert "Exchange" not in plan  # prefilter is narrow: no shuffle


def _write_sorted(spark, tmp_path, n_files=4):
    path = str(tmp_path / "zoned")
    (
        spark.range(10_000)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(n_files, "k")
        .sortWithinPartitions("k")
        .write.parquet(path)
    )
    return path


def test_zonemap_prunes_files_and_matches_full_scan(spark, tmp_path):
    path = _write_sorted(spark, tmp_path)
    zones = zonemap_from_footers(path, ["k"])
    assert len(zones) == 4 and all(z["k_min"] is not None for z in zones)
    df = pruned_read(spark, path, "k", 100, 200)
    # a range inside one sorted file must schedule exactly one file
    assert len(df.inputFiles()) == 1
    full = (
        spark.read.parquet(path)
        .where((F.col("k") >= 100) & (F.col("k") <= 200))
        .collect()
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, full))


def test_zonemap_empty_survivors_keeps_schema(spark, tmp_path):
    path = _write_sorted(spark, tmp_path)
    df = pruned_read(spark, path, "k", 1_000_000, 2_000_000)
    assert df.count() == 0 and df.columns == ["k", "v"]


def test_zonemap_missing_stats_is_conservative():
    zones = [
        {"file": "a", "k_min": 0, "k_max": 10},
        {"file": "b", "k_min": None, "k_max": None},  # no stats → keep
        {"file": "c", "k_min": 50, "k_max": 60},
    ]
    assert prune_files(zones, "k", 100, 200) == ["b"]
    assert prune_files(zones, "k", 5, 55) == ["a", "b", "c"]
    assert prune_files(zones, "k", None, 5) == ["a", "b"]


def test_zonemap_index_table_matches_footer_path(spark, tmp_path):
    path = _write_sorted(spark, tmp_path)
    idx = build_zonemap_table(spark, path, ["k"], str(tmp_path / "idx"))
    a = pruned_read(spark, path, "k", 2_400, 7_600)
    b = pruned_read_with_index(spark, path, idx, "k", 2_400, 7_600)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert set(a.inputFiles()) == set(b.inputFiles())


def test_bloom_null_keys_are_exact(spark):
    # null fact keys may pass or fail the probabilistic probe; the semi
    # join after it owns correctness either way. Null dim keys are
    # excluded from the filter build.
    from pyspark.sql import Row

    dim = spark.createDataFrame(
        [Row(k=1), Row(k=2), Row(k=None)], "k long"
    )
    fact = spark.createDataFrame(
        [Row(k=1), Row(k=None), Row(k=7)], "k long"
    )
    got = sorted(
        r["k"]
        for r in bloom_semi_join(fact, dim, "k", "k").select(fact["k"]).collect()
    )
    assert got == [1]  # SQL semantics: null never equi-joins


def test_zorder_layout_feeds_zonemap_both_columns(spark, tmp_path):
    # the layout+skipping composition: a Z-ordered table has tight
    # per-file zones on BOTH clustering columns, so the zone map prunes
    # for predicates on either — the reason to Z-order at all
    from lakeflow.sinks.layout import zorder_write

    path = str(tmp_path / "zz")
    df = spark.range(20_000).select(
        (F.col("id") % 141).alias("x"),
        ((F.col("id") * 7919) % 149).alias("y"),
    )
    zorder_write(df, path, "x", "y", n_files=8)
    for col, lo, hi in (("x", 0, 17), ("y", 130, 148)):
        pruned = pruned_read(spark, path, col, lo, hi)
        assert len(pruned.inputFiles()) < 8, f"no pruning on {col}"
        full = (
            spark.read.parquet(path)
            .where((F.col(col) >= lo) & (F.col(col) <= hi))
            .collect()
        )
        assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full))


def test_bloom_rejects_unaligned_bits(spark):
    import pytest

    dim = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(dim, "k", 100)
    words = bloom_build(dim, "k", 128)
    with pytest.raises(ValueError, match="64 \\* len"):
        bloom_might_contain("k", words, 192)

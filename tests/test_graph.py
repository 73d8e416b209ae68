"""PageRank: hand-checkable values, dangling nodes, and invariance."""

from __future__ import annotations

from pyspark.sql import Row

from lakeflow.operators.graph import RANK_SCALE, pagerank


def _edges(spark, rows):
    return spark.createDataFrame(
        [Row(src=s, dst=d, weight=w) for s, d, w in rows]
    )


def test_two_node_cycle_is_stationary(spark):
    # A<->B with equal weight: rank 1.0 is the fixed point, every round
    e = _edges(spark, [(1, 2, 1), (2, 1, 1)])
    got = {r["node"]: r["rank_micros"] for r in pagerank(e, iters=4).collect()}
    assert got == {1: RANK_SCALE, 2: RANK_SCALE}


def test_star_with_dangling_leaves(spark):
    # A -> B, A -> C (equal weight); B and C dangle (contribute nothing)
    e = _edges(spark, [(1, 2, 1), (1, 3, 1)])
    got = {r["node"]: r["rank_micros"] for r in pagerank(e, iters=1).collect()}
    # A gets no in-links: (1-d) = 150000
    # B = C = 150000 + 850000 * ((1000000 * 1) // 2) // 1000000 = 575000
    assert got == {1: 150_000, 2: 575_000, 3: 575_000}


def test_weights_split_proportionally(spark):
    e = _edges(spark, [(1, 2, 3), (1, 3, 1)])
    got = {r["node"]: r["rank_micros"] for r in pagerank(e, iters=1).collect()}
    # B receives (1e6 * 3) // 4 = 750000, C receives (1e6 * 1) // 4 = 250000
    assert got[2] == 150_000 + (850_000 * 750_000) // RANK_SCALE
    assert got[3] == 150_000 + (850_000 * 250_000) // RANK_SCALE


def test_pagerank_partitioning_invariance(spark):
    rows = [(i, (i * 7) % 23, 1 + i % 3) for i in range(200)]
    e = _edges(spark, rows)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, pagerank(e, iters=3).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = sorted(map(tuple, pagerank(e, iters=3).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b

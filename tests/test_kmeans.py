from __future__ import annotations

from pyspark.sql import Row

from lakeflow.operators.kmeans import (
    _trunc_div,
    kmeans_assign,
    kmeans_centroids,
    semantic_dup_pairs,
)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )


def test_trunc_div_matches_duckdb_semantics():
    # DuckDB `//` truncates toward zero; Python's `//` floors.
    assert _trunc_div(7, 2) == 3
    assert _trunc_div(-7, 2) == -3  # Python -7 // 2 == -4
    assert _trunc_div(0, 5) == 0


def test_kmeans_separates_two_obvious_clusters(spark):
    # two tight blobs on opposite axes; k=2 must split them
    vecs = [[1.0, 0.0, 0.01 * i, 0.0] for i in range(6)] + [
        [-1.0, 0.0, 0.0, 0.01 * i] for i in range(6)
    ]
    df = _emb_df(spark, vecs)
    cells = {r["vec_id"]: r["cell"] for r in kmeans_assign(df, k=2, n_iter=2).collect()}
    g1 = {cells[i] for i in range(6)}
    g2 = {cells[i] for i in range(6, 12)}
    assert len(g1) == 1 and len(g2) == 1 and g1 != g2


def test_kmeans_deterministic_and_in_range(spark):
    vecs = [[(i * 7 % 13) / 13.0, (i * 5 % 11) / 11.0, -((i * 3 % 7) / 7.0)] for i in range(30)]
    df = _emb_df(spark, vecs)
    a1 = sorted(map(tuple, kmeans_assign(df, k=4, n_iter=2).collect()))
    a2 = sorted(map(tuple, kmeans_assign(df, k=4, n_iter=2).collect()))
    assert a1 == a2
    assert all(0 <= c < 4 for _, c in a1)


def test_kmeans_empty_cell_carries_centroid(spark):
    # 2 tight duplicate groups but k=3: at least one cell ends up empty;
    # fit must not crash and every vector still lands in [0, k)
    vecs = [[1.0, 1.0]] * 5 + [[-1.0, -1.0]] * 5
    df = _emb_df(spark, vecs)
    cents = kmeans_centroids(df, k=3, n_iter=2)
    assert len(cents) == 3
    cells = [r["cell"] for r in kmeans_assign(df, k=3, n_iter=2).collect()]
    assert all(0 <= c < 3 for c in cells)
    assert len(set(cells)) <= 2  # the duplicate groups stay together


def test_semantic_dup_pairs_contract(spark):
    # doc 0/1 identical (cos=1), doc 2 orthogonal-ish; pairs obey
    # a<b, the threshold, and within-cell-only generation
    vecs = [[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.9, 0.1, 0.0]]
    df = _emb_df(spark, vecs)
    pairs = semantic_dup_pairs(df, k=2, n_iter=1, min_cos_micros=900_000).collect()
    assert all(r["vec_id_a"] < r["vec_id_b"] for r in pairs)
    assert all(r["cos_micros"] >= 900_000 for r in pairs)
    dup = [r for r in pairs if (r["vec_id_a"], r["vec_id_b"]) == (0, 1)]
    assert len(dup) == 1 and dup[0]["cos_micros"] == 1_000_000
    cells = {r["vec_id"]: r["cell"] for r in kmeans_assign(df, k=2, n_iter=1).collect()}
    assert all(cells[r["vec_id_a"]] == cells[r["vec_id_b"]] for r in pairs)


def test_kmeans_diagnostics_and_purity(spark):
    # two exact blobs + aligned labels: inertia 0, purity 1.0 per cell
    rows = [Row(vec_id=i, embedding=[1.0, 1.0], label=0) for i in range(5)] + [
        Row(vec_id=5 + i, embedding=[-1.0, -1.0], label=1) for i in range(5)
    ]
    df = spark.createDataFrame(rows)
    from lakeflow.operators.kmeans import kmeans_diagnostics

    diag = {r["cell"]: r for r in kmeans_diagnostics(df, k=2, n_iter=1, label_col="label").collect()}
    assert sum(r["n_vectors"] for r in diag.values()) == 10
    for r in diag.values():
        assert r["inertia"] == 0  # members sit exactly on their centroid
        assert r["purity_micros"] == 1_000_000
        assert r["n_dominant"] == r["n_vectors"]
    # without a label column: just (cell, n_vectors, inertia)
    bare = kmeans_diagnostics(df, k=2, n_iter=1)
    assert set(bare.columns) == {"cell", "n_vectors", "inertia"}


def test_broadcast_assignment_path_matches_literal(spark):
    # force the broadcast-centroid join (max_fold=0) and compare with
    # the literal-folded narrow map on the same fit
    from lakeflow.operators.kmeans import _with_best, kmeans_centroids
    from lakeflow.operators.similarity import _with_vectors

    vecs = [[(i * 7 % 13) / 13.0, (i * 5 % 11) / 11.0, -((i * 3 % 7) / 7.0)] for i in range(40)]
    df = _emb_df(spark, vecs)
    cents = kmeans_centroids(df, k=4, n_iter=1)
    base = _with_vectors(df, "vec_id", "embedding")
    lit = {r["vec_id"]: r["__m"] for r in _with_best(base, cents, "vec_id").collect()}
    bc = {r["vec_id"]: r["__m"] for r in _with_best(base, cents, "vec_id", max_fold=0).collect()}
    assert lit == bc


def test_derive_k_sizing_rule():
    from lakeflow.operators.kmeans import derive_k

    assert derive_k(500, 250) == 2
    assert derive_k(501, 250) == 3
    assert derive_k(100, 250) == 2  # floor at k_min
    assert derive_k(20000, 250) == 80

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.operators.kmeans import (
    _trunc_div,
    kmeans_assign,
    kmeans_centroids,
    semantic_dup_pairs,
)

SF = "/root/testdata/sf0.001"


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


def test_semantic_index_serving_matches_batch(spark):
    # pairs served from a prebuilt index == the in-query-fit batch path
    # (assignment is a pure function of (vector, centroids), and the
    # fit is deterministic, so the two must agree bit-for-bit)
    from lakeflow.operators.kmeans import (
        semantic_index,
        semantic_pairs_from_index,
    )

    # i starts at 1: i=0 is the zero vector, whose cosine is undefined
    # (division by zero under ANSI mode — same contract as the batch path)
    vecs = [
        [(i * 7 % 13) / 13.0, (i * 5 % 11) / 11.0, -((i * 3 % 7) / 7.0)]
        for i in range(1, 25)
    ]
    df = _emb_df(spark, vecs)
    cents = kmeans_centroids(df, k=3, n_iter=2)
    served = sorted(
        map(
            tuple,
            semantic_pairs_from_index(
                semantic_index(df, cents), min_cos_micros=500_000
            ).collect(),
        )
    )
    batch = sorted(
        map(tuple, semantic_dup_pairs(df, k=3, n_iter=2, min_cos_micros=500_000).collect())
    )
    assert served == batch and len(served) > 0


def test_incremental_semantic_equals_batch_restriction(spark):
    # incremental(new, stored index) == batch over new+stored with the
    # SAME centroids, restricted to pairs touching a new vector
    from lakeflow.operators.kmeans import (
        incremental_semantic_pairs,
        semantic_index,
        semantic_pairs_from_index,
    )

    vecs = [
        [(i * 7 % 13) / 13.0, (i * 5 % 11) / 11.0, -((i * 3 % 7) / 7.0)]
        for i in range(1, 31)
    ]
    df = _emb_df(spark, vecs)
    new = df.filter(F.col("vec_id") % 4 == 0)
    stored = df.filter(F.col("vec_id") % 4 != 0)
    cents = kmeans_centroids(stored, k=3, n_iter=2)
    got = sorted(
        map(
            tuple,
            incremental_semantic_pairs(
                new, semantic_index(stored, cents), cents, min_cos_micros=500_000
            ).collect(),
        )
    )
    want = sorted(
        tuple(r)
        for r in semantic_pairs_from_index(
            semantic_index(df, cents), min_cos_micros=500_000
        ).collect()
        if r["vec_id_a"] % 4 == 0 or r["vec_id_b"] % 4 == 0
    )
    assert got == want and len(got) > 0
    # every pair is ordered and over-threshold
    assert all(a < b and c >= 500_000 for a, b, _, c in got)


def test_semantic_index_fit_load_roundtrip(spark, tmp_path):
    from lakeflow.operators.kmeans import (
        incremental_semantic_pairs,
        load_semantic_index,
        semantic_index,
        semantic_index_fit,
    )

    emb = load_table(spark, SF, "embeddings")
    stored = emb.filter(F.col("vec_id") % 10 != 0)
    new = emb.filter(F.col("vec_id") % 10 == 0)
    idx_path = str(tmp_path / "semidx")
    cents = semantic_index_fit(spark, stored, idx_path, target_cell_size=100)
    loaded_cents, loaded_idx = load_semantic_index(spark, idx_path)
    assert loaded_cents == cents
    assert loaded_idx.count() == stored.count()
    assert set(loaded_idx.columns) == {"vec_id", "cell", "v", "n2"}
    # serving the incremental batch from the PERSISTED index equals the
    # in-flight composition
    inflight = sorted(
        map(
            tuple,
            incremental_semantic_pairs(
                new, semantic_index(stored, cents), cents, min_cos_micros=300_000
            ).collect(),
        )
    )
    served = sorted(
        map(
            tuple,
            incremental_semantic_pairs(
                new, loaded_idx, loaded_cents, min_cos_micros=300_000
            ).collect(),
        )
    )
    assert served == inflight


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


def test_pq_codebooks_and_encode_shapes(spark):
    from lakeflow.operators.pq import pq_codebooks, pq_encode

    emb = load_table(spark, SF, "embeddings")
    books = pq_codebooks(emb, m=4, k_sub=4, n_iter=1)
    assert len(books) == 4  # m subspaces
    assert all(len(b) == 4 for b in books)  # k_sub centroids each
    assert all(len(c) == 16 for b in books for c in b)  # dim/m components
    codes = pq_encode(emb, books)
    rows = codes.collect()
    assert all(len(r["codes"]) == 4 for r in rows)
    assert all(0 <= c < 4 for r in rows for c in r["codes"])
    # deterministic: refit + re-encode reproduces identical codes, and
    # codes are a function of the data, not the partitioning
    books2 = pq_codebooks(emb.repartition(7), m=4, k_sub=4, n_iter=1)
    assert books2 == books
    again = {r["vec_id"]: r["codes"] for r in pq_encode(emb.repartition(5), books2).collect()}
    assert again == {r["vec_id"]: r["codes"] for r in rows}


def test_pq_encode_is_narrow_map(spark):
    import contextlib
    import io

    from lakeflow.operators.pq import pq_codebooks, pq_encode

    emb = load_table(spark, SF, "embeddings")
    books = pq_codebooks(emb, m=4, k_sub=4, n_iter=1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pq_encode(emb, books).explain("formatted")
    plan = buf.getvalue()
    # encoding 100 TB of vectors must never shuffle or leave the JVM
    assert "Exchange" not in plan, plan
    for marker in ("ArrowEvalPython", "BatchEvalPython"):
        assert marker not in plan, plan


def test_pq_adc_orders_by_quantized_distance(spark):
    from pyspark.sql import Row

    from lakeflow.operators.pq import pq_adc_topk, pq_codebooks

    # 8-dim toy space, m=2 subspaces: two tight clusters far apart.
    # ADC must rank same-cluster vectors above cross-cluster ones.
    a = [1.0] * 8
    b = [-1.0] * 8
    rows = [
        Row(vec_id=0, embedding=[x + 0.01 for x in a]),
        Row(vec_id=1, embedding=[x - 0.01 for x in a]),
        Row(vec_id=2, embedding=[x + 0.02 for x in a]),
        Row(vec_id=10, embedding=[x + 0.01 for x in b]),
        Row(vec_id=11, embedding=[x - 0.02 for x in b]),
        Row(vec_id=12, embedding=[x + 0.03 for x in b]),
    ]
    emb = spark.createDataFrame(rows)
    books = pq_codebooks(emb, m=2, k_sub=2, n_iter=2, dim=8)
    out = pq_adc_topk(emb, F.col("vec_id") == 0, books, k=2, vec_col="embedding")
    got = {r["vec_id"] for r in out.collect()}
    assert got == {1, 2}, got


def test_ivf_pq_prunes_to_probed_cells(spark):
    from pyspark.sql import Row

    from lakeflow.operators.pq import ivf_pq_topk, pq_codebooks

    # two well-separated clusters in 8-dim space; with n_probe=1 the
    # query must only ever see candidates from its own coarse cell
    a, b = [1.0] * 8, [-1.0] * 8
    rows = [Row(vec_id=i, embedding=[x + 0.01 * i for x in a]) for i in range(5)]
    rows += [Row(vec_id=10 + i, embedding=[x - 0.01 * i for x in b]) for i in range(5)]
    emb = spark.createDataFrame(rows)
    books = pq_codebooks(emb, m=2, k_sub=2, n_iter=2, dim=8)
    out = ivf_pq_topk(
        emb, F.col("vec_id") == 0, books, n_cells=2, n_probe=1, k=9, shortlist=9
    )
    got = {r["vec_id"] for r in out.collect()}
    # only same-cluster neighbors (cell pruning), never the far cluster
    assert got <= {1, 2, 3, 4}, got
    assert len(got) == 4


def test_ivf_pq_fit_search_matches_inline(spark, tmp_path):
    from lakeflow.catalog import load_table
    from lakeflow.operators.pq import ivf_pq_fit, ivf_pq_search, ivf_pq_topk, pq_codebooks

    # fit persists the index; search against it must return exactly what
    # the inline (train-in-query) composition returns for the same
    # params — codebooks/centroids are deterministic seeded exact-int
    # k-means, so the two paths are bit-identical
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = str(tmp_path / "ivfpq")
    ivf_pq_fit(spark, emb, idx, m=4, k_sub=8, n_cells=4)
    pred = F.col("vec_id") < 3
    served = {
        tuple(r)
        for r in ivf_pq_search(
            spark, emb, pred, idx, n_probe=2, k=5, shortlist=50
        ).collect()
    }
    books = pq_codebooks(emb, m=4, k_sub=8)
    inline = {
        tuple(r)
        for r in ivf_pq_topk(
            emb, pred, books, n_cells=4, n_probe=2, k=5, shortlist=50
        ).collect()
    }
    assert served == inline and len(served) == 15


def test_ivf_pq_fit_persists_bounded_tables(spark, tmp_path):
    from lakeflow.catalog import load_table
    from lakeflow.operators.pq import ivf_pq_fit, load_ivf_pq_index

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = str(tmp_path / "ivfpq2")
    ivf_pq_fit(spark, emb, idx, m=4, k_sub=8, n_cells=4)
    books, coarse, codes = load_ivf_pq_index(spark, idx)
    assert len(books) == 4 and all(len(b) == 8 for b in books)
    assert all(len(c) == 16 for b in books for c in b)  # dim/m components
    assert len(coarse) == 4 and all(len(c) == 64 for c in coarse)
    # the index relation is one narrow row per corpus vector
    assert codes.count() == emb.count()
    assert set(codes.columns) == {"vec_id", "codes", "cell"}


def test_driver_trainers_match_distributed(spark):
    # the driver-side Lloyd replay (numpy exact ints) must equal the
    # distributed trainers bit-for-bit on the same training set — this
    # is what lets ivf_pq_fit train on a bounded collected sample
    # without changing semantics
    from lakeflow.operators.pq import (
        _collect_train,
        coarse_centroids_driver,
        pq_codebooks,
        pq_codebooks_driver,
    )

    emb = load_table(spark, SF, "embeddings")
    rows = _collect_train(emb, "vec_id", "embedding", None, "ivf")
    assert pq_codebooks_driver(rows, m=4, k_sub=8, n_iter=2, dim=64) == pq_codebooks(
        emb, m=4, k_sub=8, n_iter=2
    )
    assert coarse_centroids_driver(rows, k=8, n_iter=2, seed="kmeans") == (
        kmeans_centroids(emb, k=8, n_iter=2)
    )
    # negative-sum cells exercise the trunc-toward-zero branch
    neg = _emb_df(spark, [[-1.5] * 64, [-1.1] * 64, [2.0] * 64, [2.2] * 64])
    nrows = _collect_train(neg, "vec_id", "embedding", None, "ivf")
    assert coarse_centroids_driver(nrows, k=2, n_iter=2, seed="kmeans") == (
        kmeans_centroids(neg, k=2, n_iter=2)
    )


def test_ivf_pq_fit_sampled_training(spark, tmp_path):
    # train_sample < corpus: training runs on the deterministic
    # content-hash sample. The build must be reproducible (two builds
    # byte-equal) and the index must still cover every corpus vector;
    # answer quality is covered by q_ann_serving's recall contract.
    from lakeflow.catalog import load_table as lt
    from lakeflow.operators.pq import ivf_pq_fit, load_ivf_pq_index

    emb = lt(spark, "/root/testdata/sf0.01", "embeddings")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for idx in (a, b):
        ivf_pq_fit(spark, emb, idx, m=4, k_sub=8, n_cells=4, train_sample=100)
    ba, ca, codes_a = load_ivf_pq_index(spark, a)
    bb, cb, codes_b = load_ivf_pq_index(spark, b)
    assert ba == bb and ca == cb
    assert codes_a.count() == emb.count()  # encode pass is full-corpus
    key = lambda r: (r["vec_id"], tuple(r["codes"]), r["cell"])  # noqa: E731
    assert {key(r) for r in codes_a.collect()} == {key(r) for r in codes_b.collect()}


def test_ivf_search_probe_paths_identical(spark, tmp_path):
    # the query-side cell probe has two physical forms (folded-literal
    # argsort vs broadcast centroid-table join + per-query window, for
    # n_cells past the folding threshold) — they must return identical
    # rows including score ties (both order score desc, cell id desc)
    from lakeflow.operators.pq import _ivf_search, ivf_pq_fit, load_ivf_pq_index

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = str(tmp_path / "ivfpq3")
    ivf_pq_fit(spark, emb, idx, m=4, k_sub=8, n_cells=4)
    books, coarse, codes = load_ivf_pq_index(spark, idx)
    pred = F.col("vec_id") < 3
    folded = {
        tuple(r)
        for r in _ivf_search(
            emb, pred, codes, coarse, books, 2, 5, 50, "vec_id", "embedding"
        ).collect()
    }
    joined = {
        tuple(r)
        for r in _ivf_search(
            emb, pred, codes, coarse, books, 2, 5, 50, "vec_id", "embedding",
            max_fold=0,
        ).collect()
    }
    assert folded == joined and len(folded) == 15


def test_two_level_assignment_semantics(spark):
    # the two-level (group -> within-group argmax) assignment must
    # agree with the exact argmax on well-separated data, stay in
    # [0, k), and be partitioning-invariant
    from lakeflow.operators.pq import _assign_cells
    from lakeflow.operators.similarity import _with_vectors

    # 3 tight blobs; centroids = the blob centers themselves
    blobs = [[10.0, 0.0], [0.0, 10.0], [-10.0, -10.0]]
    rows = [
        Row(vec_id=b * 100 + i, embedding=[c + 0.01 * i for c in blob])
        for b, blob in enumerate(blobs)
        for i in range(8)
    ]
    df = spark.createDataFrame(rows)
    cents = [[int(c * 1_000_000) for c in blob] for blob in blobs]
    base = _with_vectors(df, "vec_id", "embedding")
    exact = {
        r["vec_id"]: r["cell"]
        for r in _assign_cells(spark, base, cents, "vec_id", two_level=False).collect()
    }
    two = {
        r["vec_id"]: r["cell"]
        for r in _assign_cells(
            spark, base, cents, "vec_id", max_fold=0, two_level=True
        ).collect()
    }
    assert exact == two  # separated blobs: the approximation is exact
    assert all(v // 100 == cell for v, cell in two.items())  # blob == cell
    # partitioning invariance of the two-level path
    base13 = _with_vectors(df.repartition(13, "vec_id"), "vec_id", "embedding")
    two13 = {
        r["vec_id"]: r["cell"]
        for r in _assign_cells(
            spark, base13, cents, "vec_id", max_fold=0, two_level=True
        ).collect()
    }
    assert two13 == two


def test_pq_fit_search_equals_inline(spark, tmp_path):
    # flat-PQ build/serve split (round 7, the q_pq_ann twin of the
    # IVF-PQ split): searching a persisted index must equal the inline
    # train+encode+search composition row-for-row
    from lakeflow.operators.pq import (
        _collect_train,
        pq_ann_topk,
        pq_codebooks_driver,
        pq_fit,
        pq_search,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = str(tmp_path / "pqflat")
    pq_fit(spark, emb, idx, m=4, k_sub=8)
    pred = F.col("vec_id") < 3
    served = {
        tuple(r) for r in pq_search(spark, emb, pred, idx, k=5, shortlist=50).collect()
    }
    books = pq_codebooks_driver(
        _collect_train(emb, "vec_id", "embedding", 16_384, "pq"),
        m=4, k_sub=8, n_iter=2, dim=64,
    )
    inline = {
        tuple(r) for r in pq_ann_topk(emb, pred, books, k=5, shortlist=50).collect()
    }
    assert served == inline and len(served) == 15


def test_ivf_pq_fit_scales_sample_with_derived_cells(spark, tmp_path):
    # REGRESSION (r6 advice, pq.py): corpus-derived n_cells can exceed
    # the default training sample — the fit must scale the sample with
    # k (and fall back to the distributed trainer past the cap) instead
    # of raising "training set has fewer than k vectors". Forced here
    # with a tiny train_sample so n_cells > sample at gate scale.
    from lakeflow.operators.pq import ivf_pq_fit, load_ivf_pq_index

    from lakeflow.operators.kmeans import derive_k

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()
    idx = str(tmp_path / "ivfpq_scaled")
    # target 8 -> n_cells = ceil(n/8), far beyond train_sample = 16
    ivf_pq_fit(
        spark, emb, idx, m=4, k_sub=8, target_cell_size=8, train_sample=16
    )
    _, coarse, codes = load_ivf_pq_index(spark, idx)
    assert len(coarse) == derive_k(n, 8, k_min=2) > 16
    assert codes.count() == n  # every vector indexed once


def test_ivf_pq_fit_distributed_fallback_past_cap(spark, tmp_path, monkeypatch):
    # when the scaled sample hits DRIVER_TRAIN_CAP and n_cells still
    # exceeds what was collected, the coarse fit must fall back to the
    # distributed trainer instead of raising — forced here by shrinking
    # the cap below n_cells
    import lakeflow.operators.pq as pqmod
    from lakeflow.operators.kmeans import derive_k

    monkeypatch.setattr(pqmod, "DRIVER_TRAIN_CAP", 32)
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()
    idx = str(tmp_path / "ivfpq_fallback")
    pqmod.ivf_pq_fit(
        spark, emb, idx, m=4, k_sub=8, target_cell_size=8, train_sample=16
    )
    _, coarse, codes = pqmod.load_ivf_pq_index(spark, idx)
    assert len(coarse) == derive_k(n, 8, k_min=2) > 32
    assert codes.count() == n


def test_local_table_paths_agree(spark):
    # the VALUES-literal and Arrow createDataFrame routes must produce
    # identical relations (schema + values); the Arrow route engages
    # past the literal-cell threshold (r6 advice: a corpus-derived-k
    # centroid table as SQL text is tens of MB to parse)
    from lakeflow.functions.localrel import local_table

    rows = [(i, [i * 10, -i], i * i) for i in range(50)]
    lit = local_table(spark, rows, ["i", "cv", "c2"])
    arrow = local_table(spark, rows, ["i", "cv", "c2"], max_literal_cells=0)
    assert [f.dataType.simpleString() for f in lit.schema.fields] == [
        f.dataType.simpleString() for f in arrow.schema.fields
    ]
    assert sorted(map(tuple, lit.collect())) == sorted(map(tuple, arrow.collect()))


def test_two_level_empty_group_loses_no_rows(spark):
    # REGRESSION (r6 advice, kmeans.py): grouping the k centroids can
    # leave a group with ZERO member centroids while its stale group
    # centroid still strictly wins some vectors — under the old code a
    # vector tagged with that group matched no rows in the inner
    # centroid join and silently VANISHED (row loss, not the documented
    # IVF misassignment). _group_centroids now drops empty groups and
    # remaps ids densely, so every tagged vector joins >= 1 centroid.
    # This centroid set (found by search) empties group 0 with stale
    # group centroid [-2000, 8500] micros, which strictly wins a vector
    # placed exactly there.
    from lakeflow.operators.kmeans import _group_centroids
    from lakeflow.operators.pq import _assign_cells
    from lakeflow.operators.similarity import _with_vectors

    cents = [
        [-13000, 56000],
        [45000, -69000],
        [-12000, 98000],
        [9000, -39000],
        [-73000, -99000],
        [18000, -70000],
    ]
    gc, grp = _group_centroids(cents, 3)
    assert set(grp) == set(range(len(gc)))  # the invariant itself
    rows = [Row(vec_id=0, embedding=[-0.002, 0.0085])] + [
        Row(vec_id=i + 1, embedding=[c / 1_000_000 for c in cent])
        for i, cent in enumerate(cents)
    ]
    base = _with_vectors(spark.createDataFrame(rows), "vec_id", "embedding")
    exact = {
        r["vec_id"]: r["cell"]
        for r in _assign_cells(spark, base, cents, "vec_id", two_level=False).collect()
    }
    two = {
        r["vec_id"]: r["cell"]
        for r in _assign_cells(
            spark, base, cents, "vec_id", max_fold=0, two_level=True
        ).collect()
    }
    assert len(exact) == len(rows)
    assert len(two) == len(rows)  # was len(rows) - 1 before the fix
    assert all(0 <= c < len(cents) for c in two.values())


def test_ivf_pq_fit_two_level_serves_with_recall(spark, tmp_path):
    # a two-level-assigned index still serves: every corpus vector is
    # indexed exactly once, cells are in range, and a served query's
    # exact rerank returns k rows (recall quality is asserted by the
    # q_ann_serving contract; at gate scales the exact path runs, so
    # force two_level here)
    from lakeflow.operators.pq import ivf_pq_fit, ivf_pq_search, load_ivf_pq_index

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    idx = str(tmp_path / "ivfpq2l")
    ivf_pq_fit(spark, emb, idx, m=4, k_sub=8, n_cells=9, two_level=True)
    _, coarse, codes = load_ivf_pq_index(spark, idx)
    assert codes.count() == emb.count()
    cells = [r["cell"] for r in codes.select("cell").distinct().collect()]
    assert all(0 <= c < 9 for c in cells)
    out = ivf_pq_search(
        spark, emb, F.col("vec_id") < 3, idx, n_probe=4, k=5, shortlist=100
    )
    assert out.count() == 15


def test_cell_pair_scores_ragged_and_null_fallback(spark):
    # r11 optimization round: the grouped-numpy pair kernel falls back
    # to an exact per-pair path on ragged / null-bearing cells,
    # replicating the former join's zip_with semantics — a pair whose
    # vectors differ in length (or carry a null element) yields a null
    # dot and is DROPPED, never scored wrong
    from lakeflow.operators.kmeans import _cell_pair_scores

    rows = [
        # cell 0: two clean identical 2-vectors + one ragged 3-vector
        (0, [1_000_000, 0], 0),
        (1, [1_000_000, 0], 0),
        (2, [1_000_000, 0, 0], 0),
        # cell 1: a null element poisons every pair touching row 4
        (3, [0, 1_000_000], 1),
        (4, [0, None], 1),
        (5, [0, 1_000_000], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, __v array<long>, cell long"
    )
    got = sorted(
        (r["vec_id_a"], r["vec_id_b"], r["cell"], r["cos_micros"])
        for r in _cell_pair_scores(df, "vec_id", 500_000).collect()
    )
    # ragged row 2 and null row 4 pair with nothing; the clean pairs
    # score exactly
    assert got == [(0, 1, 0, 1_000_000), (3, 5, 1, 1_000_000)]


def test_cell_pair_scores_matches_join_form_exactly(spark):
    # the numpy kernel must reproduce the former within-cell join's
    # integer cosines bit-for-bit (same int64 dots, same IEEE double
    # sequence) — cross-check against dot_long/cosine_micros on a
    # corpus whose cosines straddle the threshold
    from lakeflow.operators.kmeans import _cell_pair_scores
    from lakeflow.operators.similarity import cosine_micros, dot_long

    vecs = [
        [(i * 7 % 13) / 13.0, (i * 5 % 11) / 11.0, ((i * 3 % 7) / 7.0)]
        for i in range(1, 30)
    ]
    base = _emb_df(spark, vecs).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(1_000_000) + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("__v"),
        (F.col("vec_id") % 3).cast("long").alias("cell"),
    )
    got = sorted(
        map(tuple, _cell_pair_scores(base, "vec_id", 700_000).collect())
    )
    a = base.select(
        F.col("vec_id").alias("vec_id_a"),
        F.col("__v").alias("__va"),
        "cell",
    )
    b = base.select(
        F.col("vec_id").alias("vec_id_b"),
        F.col("__v").alias("__vb"),
        "cell",
    )
    n2 = lambda c: dot_long(F.col(c), F.col(c))  # noqa: E731
    want = sorted(
        map(
            tuple,
            a.join(b, "cell")
            .filter(F.col("vec_id_a") < F.col("vec_id_b"))
            .select(
                "vec_id_a",
                "vec_id_b",
                "cell",
                cosine_micros(
                    dot_long(F.col("__va"), F.col("__vb")),
                    n2("__va"),
                    n2("__vb"),
                ).alias("cos_micros"),
            )
            .filter(F.col("cos_micros") >= 700_000)
            .select("vec_id_a", "vec_id_b", "cell", "cos_micros")
            .collect(),
        )
    )
    assert got == want and len(got) > 0

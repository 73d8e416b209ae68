"""Distributed PCA for embedding columns (SURVEY §2.12).

Embedding preprocessing at corpus scale — decorrelate / compress the
vector column before dedup, clustering, or ANN indexing — splits into
the classic two-phase shape this repo uses everywhere (kmeans, PQ,
BPE): a DISTRIBUTED sufficient-statistics pass whose cost is one scan,
and a DRIVER-BOUNDED fit over the collected statistics (a dim x dim
matrix — 64x64 here — independent of corpus size).

- ``gram_sums`` is the scan: per dimension i, the exact integer sums
  (n, sum x_i, sum x_i*x_j for all j) over the micro-int vectors
  (``similarity.to_micro_ints``). ONE posexplode (dim-fold
  amplification, map-side combined to <= dim rows per partition before
  the tiny shuffle) and 2 + dim aggregate expressions — inside the
  whole-stage-codegen field budget, unlike the naive dim^2-column or
  dim^2-row shapes. Sums accumulate in DECIMAL(38,0): exact at any
  corpus size (1e12-row corpora overflow BIGINT at micro^2 magnitudes).
- ``gram_means`` is the certified surface: the upper triangle
  (i, j, n, mean_micro2) where mean_micro2 = trunc(s_xy / n) — the
  magnitude-bounded form (|mean| <= max|x_i*x_j| <= ~1e12 regardless
  of n, so the OUTPUT stays BIGINT at 100 TB even though the sums
  cannot). Sign is split around the division so Spark's `div` and an
  oracle's `//` agree on negative sums.
- ``pca_fit`` collects the dim x dim statistics (bounded: dim + dim^2
  cells), centers to the covariance driver-side, runs numpy ``eigh``
  (symmetric, deterministic), fixes each eigenvector's sign so its
  largest-|w| entry is positive (argmax ties break to the first
  index), and QUANTIZES the components to nano-unit integers — the
  model that ships back into the plan is pure integers, so the
  distributed projection is exact and any engine replays it.
- ``pca_project`` applies the model as one codegen expression per
  component over the corpus scan — no shuffle, no Python: centered
  micro vector dot nano weights (exact long, |term| <= ~2e15, dim-fold
  sums < 2^62), truncated back to micros around a sign split.
  ``whiten=True`` additionally scales each component by the fitted
  1e6/sqrt(eigenvalue) micro multiplier.

Reference parity: the reference has no vector ops at all (its analogue
is pandas-side column math, e.g. utils/df_utils.py:4-14); this module
is §2.12 training-data-pipeline surface, Spark-first.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakeflow.functions.exact import trunc_div as _trunc_div
from lakeflow.operators.similarity import to_micro_ints

#: driver-side fit refuses dims past this — the collected gram is
#: dim^2 cells and eigh is O(dim^3); 4096-dim embeddings still collect
#: only 16M bounded cells but belong in a blocked solver, not here.
MAX_FIT_DIM = 1024


def _dim_of(emb: DataFrame, vec_col: str) -> int:
    """Vector width from a 1-row probe (bounded driver action)."""
    row = emb.select(F.size(F.col(vec_col)).alias("d")).head()
    if row is None:
        raise ValueError("pca: empty corpus — nothing to fit")
    return int(row["d"])


def gram_sums(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension exact sufficient statistics over the micro-int
    vectors: one row per dimension i with (i, n, sx DECIMAL(38,0),
    sxy array<DECIMAL(38,0)> — sum of x_i*x_j for every j).

    One posexplode + (2 + dim) aggregate expressions over <= dim group
    keys; every partition map-side-combines to <= dim rows before the
    shuffle, so the pass costs one scan at any corpus size."""
    dim = _dim_of(emb, vec_col)
    if dim > MAX_FIT_DIM:
        raise ValueError(f"pca: dim {dim} exceeds MAX_FIT_DIM {MAX_FIT_DIM}")
    rows = emb.select(to_micro_ints(vec_col).alias("__v")).select(
        F.posexplode("__v").alias("__i", "__xi"), "__v"
    )
    agged = rows.groupBy("__i").agg(
        # non-null count, NOT count(*): a null-padded element at
        # position i is skipped by the sums, so it must also lower n
        # for that i — pca_fit's uniform-n assertion then catches
        # null padding instead of silently averaging over fewer
        # samples than it divides by. (Ragged SHORT vectors already
        # fail loudly: ANSI element_at raises past the array end.)
        F.count(F.col("__xi")).alias("__n"),
        F.sum(F.col("__xi").cast("decimal(38,0)")).alias("__sx"),
        *[
            F.sum(
                (F.col("__xi") * F.element_at("__v", j + 1)).cast("decimal(38,0)")
            ).alias(f"__s{j}")
            for j in range(dim)
        ],
    )
    return agged.select(
        F.col("__i").cast("long").alias("i"),
        F.col("__n").cast("long").alias("n"),
        F.col("__sx").alias("sx"),
        F.array(*[F.col(f"__s{j}") for j in range(dim)]).alias("sxy"),
    )


def gram_means(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """The certified distributed pass: upper triangle (i, j, n,
    mean_micro2) of the uncentered second-moment matrix, where
    mean_micro2 = trunc(sum(x_i * x_j) / n) in micro^2 units.

    The mean (not the sum) is the output precisely because its
    magnitude is bounded by max|x_i*x_j| independent of corpus size —
    the BIGINT-safe surface of a DECIMAL(38) accumulation."""
    g = gram_sums(emb, vec_col)
    tri = g.select(
        "i",
        "n",
        F.posexplode("sxy").alias("__j", "__s"),
    ).filter(F.col("__j") >= F.col("i"))
    return tri.select(
        "i",
        F.col("__j").cast("long").alias("j"),
        F.col("n"),
        _trunc_div(F.col("__s"), F.col("n")).alias("mean_micro2"),
    )


@dataclass(frozen=True)
class PCAModel:
    """Integer-quantized PCA model: everything a distributed projection
    needs, in exact units any engine reproduces."""

    n: int
    dim: int
    k: int
    mean_micros: tuple[int, ...]  # per-dim mean, micro units (trunc)
    comps_nano: tuple[tuple[int, ...], ...]  # k x dim, nano units
    eig_micro2: tuple[int, ...]  # eigenvalues, micro^2 units (trunc)
    evr_micros: tuple[int, ...]  # explained-variance ratio, micros
    whiten_micro: tuple[int, ...]  # 1e6/sqrt(eig) multiplier, micros


def pca_fit(emb: DataFrame, k: int, vec_col: str = "embedding") -> PCAModel:
    """Fit PCA from ONE distributed statistics pass + a driver-bounded
    eigendecomposition. Exact integer statistics in, integer-quantized
    model out; the float work (eigh) happens once on a dim x dim
    matrix and never touches row data."""
    import numpy as np

    try:
        stats = gram_sums(emb, vec_col).collect()  # bounded: dim rows
    except Exception as exc:  # ANSI element_at past a short vector
        if "INVALID_ARRAY_INDEX" in str(exc):
            raise ValueError(
                "pca_fit: ragged or null-padded vector column — a vector "
                "is shorter than the probed dimension; every vector must "
                "be a null-free array of the same length"
            ) from exc
        raise
    if not stats:
        raise ValueError("pca_fit: empty corpus")
    dim = len(stats[0]["sxy"])
    if not 1 <= k <= dim:
        raise ValueError(f"pca_fit: k={k} outside [1, dim={dim}]")
    # Ragged / null-padded guard: a short vector contributes no row
    # for its missing dimensions and a null element is excluded from
    # that dimension's non-null n, so ANY non-uniform vector shows up
    # as per-dimension counts that disagree (or as extra/missing
    # dimension rows vs the 1-row probe). Without this, F.sum's
    # null-skipping would silently fit statistics over different
    # sample sets per cell.
    dims_seen = sorted(int(r["i"]) for r in stats)
    ns = {int(r["n"]) for r in stats}
    if dims_seen != list(range(dim)) or len(ns) != 1:
        raise ValueError(
            "pca_fit: ragged or null-padded vector column — "
            f"per-dimension sample counts {sorted(ns)} over dimensions "
            f"[{dims_seen[0]}..{dims_seen[-1]}] ({len(dims_seen)} of "
            f"{dim}); every vector must be a null-free array of the "
            "same length"
        )
    n = int(stats[0]["n"])
    sx = np.zeros(dim)
    s2 = np.zeros((dim, dim))
    for r in stats:
        i = int(r["i"])
        sx[i] = float(int(r["sx"]))  # Decimal -> exact python int
        s2[i, :] = [float(int(v)) for v in r["sxy"]]
    return _fit_from_arrays(n, sx, s2, k)


def _fit_from_arrays(n: int, sx, s2, k: int) -> PCAModel:
    """The driver half shared by the batch fit and the maintained-
    table fit: exact sums in, quantized model out."""
    import numpy as np

    dim = len(sx)
    mean = np.asarray(sx) / n
    cov = np.asarray(s2) / n - np.outer(mean, mean)  # micro^2 units
    eigval, eigvec = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigval)[::-1][:k]
    comps, eigs = [], []
    for idx in order:
        w = eigvec[:, idx]
        pivot = int(np.argmax(np.abs(w)))  # first max breaks ties
        if w[pivot] < 0:
            w = -w
        comps.append(tuple(int(round(x * 1e9)) for x in w))
        eigs.append(max(float(eigval[idx]), 0.0))
    total_var = max(float(np.trace(cov)), 1e-12)
    return PCAModel(
        n=n,
        dim=dim,
        k=k,
        mean_micros=tuple(int(m) for m in mean),  # trunc toward zero
        comps_nano=tuple(comps),
        eig_micro2=tuple(int(e) for e in eigs),
        evr_micros=tuple(int(e / total_var * 1e6) for e in eigs),
        whiten_micro=tuple(
            int(round(1e6 / (e / 1e12) ** 0.5)) if e > 0 else 0 for e in eigs
        ),
    )


def gram_triples(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """The MERGEABLE form of :func:`gram_sums`: flat rows
    (i, j, s, sx, n) over the upper triangle, where s = sum x_i*x_j
    and the per-dimension first-moment sum ``sx`` and row count ``n``
    ride on the DIAGONAL rows only (zero elsewhere) — every measure is
    additive, so ``sinks/merge.merge_additive`` folds per-batch deltas
    into a running statistics table and PCA becomes an incrementally
    maintained model (``corpus_intake.stream_gram_stats`` +
    ``read_pca_model``): dim*(dim+1)/2 rows regardless of corpus
    size, never a history re-scan."""
    g = gram_sums(emb, vec_col)
    tri = g.select(
        "i", "n", "sx", F.posexplode("sxy").alias("__j", "__s")
    ).filter(F.col("__j") >= F.col("i"))
    diag = F.col("__j") == F.col("i")
    zero = F.lit(0).cast("decimal(38,0)")
    return tri.select(
        "i",
        F.col("__j").cast("long").alias("j"),
        F.col("__s").alias("s"),
        F.when(diag, F.col("sx")).otherwise(zero).alias("sx"),
        F.when(diag, F.col("n")).otherwise(F.lit(0)).cast("long").alias("n"),
    )


def pca_fit_from_triples(rows, k: int) -> PCAModel:
    """Fit from COLLECTED (i, j, s, sx, n) triples — the read path of
    the incrementally maintained statistics table. Bit-identical to
    ``pca_fit`` over the same corpus: both feed the same exact sums to
    the same driver eigh."""
    import numpy as np

    rows = list(rows)
    if not rows:
        raise ValueError("pca_fit_from_triples: empty statistics table")
    dim = max(int(r["j"]) for r in rows) + 1
    if not 1 <= k <= dim:
        raise ValueError(f"pca_fit_from_triples: k={k} outside [1, dim={dim}]")
    sx = np.zeros(dim)
    s2 = np.zeros((dim, dim))
    n = 0
    for r in rows:
        i, j = int(r["i"]), int(r["j"])
        s = float(int(r["s"]))
        s2[i, j] = s
        s2[j, i] = s
        if i == j:
            sx[i] = float(int(r["sx"]))
            n = max(n, int(r["n"]))
    if n <= 0:
        raise ValueError("pca_fit_from_triples: zero row count")
    return _fit_from_arrays(n, sx, s2, k)


def pca_project(
    emb: DataFrame,
    model: PCAModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    whiten: bool = False,
    out_prefix: str = "pc",
) -> DataFrame:
    """Project the corpus onto the fitted components: (id, pc0_micros
    .. pc{k-1}_micros). One codegen expression per component over the
    scan — the model folds in as literals (the kmeans/MMR shape), so
    there is no join, no shuffle, and no Python in the path.

    Each score is an exact long: centered micro value times nano
    weight, dim-fold sum, truncated back to micros around a sign
    split. With ``whiten=True`` scores additionally scale by the
    fitted 1e6/sqrt(eigenvalue) multiplier (micros in, micros out)."""
    v = to_micro_ints(vec_col)
    cols = [F.col(id_col)]
    for c in range(model.k):
        w = model.comps_nano[c]
        terms = None
        for d in range(model.dim):
            if w[d] == 0:
                continue
            t = (F.element_at(v, d + 1) - F.lit(model.mean_micros[d])) * F.lit(w[d])
            terms = t if terms is None else terms + t
        if terms is None:
            terms = F.lit(0).cast("long")
        score = _trunc_div(terms, F.lit(1000000000).cast("long"))
        if whiten:
            score = _trunc_div(
                score * F.lit(model.whiten_micro[c]), F.lit(1000000).cast("long")
            )
        cols.append(score.alias(f"{out_prefix}{c}_micros"))
    return emb.select(*cols)

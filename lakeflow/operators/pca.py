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


def _gram_partials_fn(dim: int):
    """Per-task Arrow partial-gram accumulator (guide §4.2 shape: Spark
    does distribution and the scan; the per-batch heavy lifting — the
    dim x dim integer products — runs through one vectorized numpy
    matmul per batch instead of dim^2 aggregate expressions). Exact by
    construction: micro quantization is the same IEEE double sequence
    as ``to_micro_ints`` (cast double, *1e6, +0.5, floor), per-slice
    int64 matmuls are sliced so no sum can overflow, and the running
    totals accumulate in arbitrary-precision Python ints. Yields ONE
    dim-row partial per task: (i, n, sx, s0..s{dim-1}) with the sums
    as DECIMAL(38,0)."""

    def fn(batches):
        import math

        import numpy as np
        import pyarrow as pa

        dec = pa.decimal128(38, 0)
        n_acc = [0] * dim
        sx_acc = [0] * dim
        s_acc = np.zeros((dim, dim), dtype=object)
        saw = False
        for b in batches:
            arr = b.column(0)
            m = len(arr)
            if m == 0:
                continue
            saw = True
            if arr.null_count == 0:
                values = arr.flatten()
            else:
                values = None
            if values is not None and values.null_count == 0:
                # per-ROW length validation (ADVICE r11): the flattened
                # total alone admits mixed-length rows whose lengths
                # compensate (dim-1 + dim+1), which reshape would then
                # silently misalign — every later row's products wrong
                lens = pa.compute.list_value_length(arr).to_numpy(
                    zero_copy_only=False
                )
                if not (lens == dim).all():
                    raise ValueError(
                        "INVALID_ARRAY_INDEX: gram_sums saw a vector whose "
                        f"length differs from the probed dimension {dim}"
                    )
                v = values.to_numpy(zero_copy_only=False).astype(np.float64)
                if not np.isfinite(v).all():
                    # the old expression path raised under ANSI for a
                    # NaN/Inf -> long cast; np.floor(NaN).astype(int64)
                    # is undefined (INT64_MIN, which also breaks the
                    # abs() overflow guard) — fail loudly instead
                    raise ValueError(
                        "gram_sums: non-finite embedding component "
                        "(NaN/Inf) is not representable in exact micros"
                    )
                x = np.floor(v * 1_000_000.0 + 0.5)
                xi = x.astype(np.int64).reshape(m, dim)
                mx = int(np.abs(xi).max(initial=0))
                if mx > 3_037_000_499:  # mx*mx would overflow int64
                    raise ValueError(
                        "gram_sums: |micro component| too large for exact "
                        f"int64 products ({mx})"
                    )
                # slice so B * mx^2 stays < 2^62 — the int64 matmul is
                # then exactly the decimal sum it replaces
                step = m
                if mx:
                    step = max(1, min(m, int(4.6e18 // (mx * mx))))
                for lo in range(0, m, step):
                    part = xi[lo : lo + step]
                    s = part.T @ part
                    s_acc = s_acc + s
                    sxp = part.sum(axis=0)
                    for i in range(dim):
                        sx_acc[i] += int(sxp[i])
                for i in range(dim):
                    n_acc[i] += m
            else:
                # null rows / null elements: exact row-at-a-time path
                # (null-bearing corpora are the degenerate case; the
                # semantics match the old aggregate — a null element is
                # excluded from its dimension's n and from every
                # product touching it)
                for r in arr.to_pylist():
                    if r is None:
                        continue
                    if len(r) != dim:
                        raise ValueError(
                            "INVALID_ARRAY_INDEX: gram_sums saw a vector "
                            "whose length differs from the probed "
                            f"dimension {dim}"
                        )
                    xm = [
                        None
                        if x is None
                        else math.floor(float(x) * 1_000_000.0 + 0.5)
                        for x in r
                    ]
                    for i in range(dim):
                        if xm[i] is None:
                            continue
                        n_acc[i] += 1
                        sx_acc[i] += xm[i]
                        for j in range(dim):
                            if xm[j] is not None:
                                s_acc[i, j] += xm[i] * xm[j]
        if not saw:
            return
        cols = [
            pa.array(range(dim), type=pa.int64()),
            pa.array(n_acc, type=pa.int64()),
            pa.array(sx_acc, type=dec),
        ]
        for j in range(dim):
            cols.append(
                pa.array([int(s_acc[i, j]) for i in range(dim)], type=dec)
            )
        names = ["i", "n", "sx"] + [f"__s{j}" for j in range(dim)]
        yield pa.RecordBatch.from_arrays(cols, names=names)

    return fn


def gram_sums(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension exact sufficient statistics over the micro-int
    vectors: one row per dimension i with (i, n, sx DECIMAL(38,0),
    sxy array<DECIMAL(38,0)> — sum of x_i*x_j for every j).

    One ``mapInArrow`` pass computes a dim-row partial gram PER TASK
    (iterator form: the accumulator lives across every batch in the
    partition — guide §4.5), so the merge aggregates P x dim tiny rows
    instead of running dim decimal(38,0) aggregate expressions over
    the dim-fold posexplode of the corpus. The old aggregate shape
    carried 130-field decimal buffers that pushed the whole stage out
    of codegen and did every product+add in Decimal128 — measured
    2.68s -> 0.4s at sf0.1 with identical output (the per-batch int64
    matmuls are sliced so they cannot overflow, then folded into
    arbitrary-precision totals, so the DECIMAL(38,0) exactness
    contract is unchanged at any corpus size)."""
    dim = _dim_of(emb, vec_col)
    if dim > MAX_FIT_DIM:
        raise ValueError(f"pca: dim {dim} exceeds MAX_FIT_DIM {MAX_FIT_DIM}")
    schema = "i long, n long, sx decimal(38,0), " + ", ".join(
        f"__s{j} decimal(38,0)" for j in range(dim)
    )
    part = emb.select(F.col(vec_col)).mapInArrow(
        _gram_partials_fn(dim), schema
    )
    agged = part.groupBy("i").agg(
        F.sum("n").alias("__n"),
        F.sum("sx").alias("__sx"),
        *[F.sum(f"__s{j}").alias(f"__m{j}") for j in range(dim)],
    )
    return agged.select(
        F.col("i").cast("long").alias("i"),
        F.col("__n").cast("long").alias("n"),
        # sum(decimal(38,0)) widens to decimal(38,0) already; cast for
        # schema stability
        F.col("__sx").cast("decimal(38,0)").alias("sx"),
        F.array(
            *[F.col(f"__m{j}").cast("decimal(38,0)") for j in range(dim)]
        ).alias("sxy"),
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

"""Trainable linear quality filter (SURVEY §2.12 extension — the
CCNet/fastText-style *learned* tier above the rule-based Gopher/C4
filters): weak labels in, a linear scorer out, trained DISTRIBUTED
with one aggregate per epoch and served as a pure-codegen projection.

Why a batch perceptron and not logistic regression: the fit must be
bit-reproducible across engines so the whole training loop replays in
a SQL oracle (the repo's correctness contract, same as the
Fellegi-Sunter EM in ``operators/linkage.fit_fs_em``). Logistic
regression needs ``exp``, which IEEE 754 does not require to be
correctly rounded — Java's ``Math.exp`` and a C library's can differ
in the last ulp, and one ulp at a quantization boundary breaks hash
equality. The margin perceptron needs only +, *, and comparisons on
integers: every epoch update is an EXACT long sum, so any engine
reproduces the fit bit-for-bit. (For calibrated probabilities at
serving time, rank by the integer score and calibrate downstream —
the FILTER decision only needs the sign/threshold.)

Spark-first shape (the k-means / EM / PQ training pattern):
- features are integer micro-unit expressions (pure codegen, SQL
  mirrors in :func:`sql_text_features`), never Python;
- each epoch is ONE whole-corpus aggregate: conditional sums of
  ``y * x_i`` over currently-misclassified rows (margin test folds the
  current weights in as literals);
- the weight vector (k longs) is the only driver-side state;
- scoring folds the final weights into a narrow projection — serving
  cost is a codegen dot product, independent of how the model was fit.

Overflow discipline: features are bounded by 1e6, so an epoch's update
sum is <= n_rows * 1e6 per weight and the dot product is
<= k * |w|_max * 1e6 — comfortably inside int64 for corpora up to
~1e9 rows per epoch with a handful of epochs. At larger n, downscale
the per-epoch update (integer div) before folding; the contract is
unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def text_feature_micros(text_col: str) -> list[Column]:
    """The fixed text feature map, each in integer micros [0, 1e6]:
    bias, capped length, whitespace ratio, digit ratio, terminal-punct
    ratio. Cheap single-pass expressions chosen for cross-engine
    exactness (counts and integer ratios only — see
    :func:`sql_text_features` for the DuckDB mirrors)."""
    t = F.col(text_col)
    n = F.greatest(F.length(t), F.lit(1))
    spaces = F.length(t) - F.length(F.regexp_replace(t, " ", ""))
    digits = F.length(t) - F.length(F.regexp_replace(t, "[0-9]", ""))
    dots = F.length(t) - F.length(F.regexp_replace(t, "[.!?]", ""))
    def ratio(cnt: Column) -> Column:
        # integer division, exact: numerator <= 2000 * 1e6 << 2^53, so
        # floor(double-div) == DuckDB's BIGINT // on non-negatives
        return F.floor(
            (cnt.cast("long") * F.lit(MICRO)) / n.cast("long")
        ).cast("long")

    return [
        F.lit(MICRO).cast("long"),
        F.least(F.length(t), F.lit(2000)).cast("long") * F.lit(500),
        ratio(spaces),
        ratio(digits),
        ratio(dots),
    ]


def sql_text_features(col: str) -> list[str]:
    """DuckDB mirrors of :func:`text_feature_micros` (same order)."""
    n = f"GREATEST(LENGTH({col}), 1)"
    spaces = f"(LENGTH({col}) - LENGTH(REPLACE({col}, ' ', '')))"
    digits = (
        f"(LENGTH({col}) - LENGTH(regexp_replace({col}, '[0-9]', '', 'g')))"
    )
    dots = (
        f"(LENGTH({col}) - LENGTH(regexp_replace({col}, '[.!?]', '', 'g')))"
    )
    return [
        "1000000",
        f"CAST(LEAST(LENGTH({col}), 2000) AS BIGINT) * 500",
        f"CAST({spaces} AS BIGINT) * 1000000 // {n}",
        f"CAST({digits} AS BIGINT) * 1000000 // {n}",
        f"CAST({dots} AS BIGINT) * 1000000 // {n}",
    ]


def _dot(weights: Sequence[int], xs: Sequence[Column]) -> Column:
    acc = None
    for w, x in zip(weights, xs):
        term = x * F.lit(int(w))
        acc = term if acc is None else acc + term
    return acc


def fit_linear_filter(
    df: DataFrame,
    label_col: str,
    features: Sequence[Column],
    n_epochs: int = 2,
    margin: int = 0,
) -> list[int]:
    """Train the margin perceptron: ``label_col`` is ±1 (long); each
    epoch folds the current weights in as literals and takes ONE
    aggregate — ``sum(y * x_i)`` over rows with ``y * (w·x) <=
    margin`` — then adds the exact integer update driver-side. Epochs
    are fixed, not convergence-tested (each costs one scan; two
    already separate planted populations — tested), mirroring
    ``fit_fs_em``. Returns the weight vector as Python ints,
    bit-reproducible across engines and partitionings."""
    xs = [x.cast("long") for x in features]
    y = F.col(label_col).cast("long")
    w = [0] * len(xs)
    for _ in range(n_epochs):
        mis = (y * _dot(w, xs)) <= F.lit(int(margin))
        row = df.agg(
            *[
                F.sum(F.when(mis, y * x).otherwise(F.lit(0))).alias(f"u{i}")
                for i, x in enumerate(xs)
            ]
        ).collect()[0]
        if row["u0"] is None:  # empty training set: nothing to fit
            return w
        w = [wi + int(row[f"u{i}"]) for i, wi in enumerate(w)]
    return w


def score_linear(
    df: DataFrame,
    weights: Sequence[int],
    features: Sequence[Column],
    score_col: str = "score",
    keep_col: str = "keep",
    threshold: int = 0,
) -> DataFrame:
    """Serve the fitted filter: ``score = w·x`` (exact long) and
    ``keep = score > threshold`` as one narrow codegen projection —
    the weights are folded literals, so scoring 100 TB is a scan-local
    map with no shuffle and no Python."""
    xs = [x.cast("long") for x in features]
    s = _dot(weights, xs)
    return df.withColumn(score_col, s).withColumn(
        keep_col, F.col(score_col) > F.lit(int(threshold))
    )

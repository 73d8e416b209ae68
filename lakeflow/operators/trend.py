"""Per-group ordinary-least-squares trend fitting in one aggregation
pass.

``y = a + b*x`` per group from the five classic sufficient statistics
(n, Sx, Sy, Sxy, Sxx) — a single map-side-combined hash aggregate, no
windows, no iteration, no driver math. The statistics are EXACT:
per-row products stay in longs (callers pass bounded integer x and
micro-scaled y), cross-row sums ride ``decimal(38,0)`` (Spark) /
``HUGEINT`` (DuckDB oracles), so both engines derive the numerator and
denominator as identical integers and the only floating-point steps are
the two final divisions — bit-identical IEEE754 in either engine.

The statistics are also ADDITIVE — stats(A ∪ B) = stats(A) + stats(B)
column-wise — which is what makes the fit incrementally maintainable:
``streaming/monitor.stream_trend_stats`` folds per-batch deltas into a
running stats table with ``merge_additive`` and the slope is derived
at READ time from the totals, so "is this metric drifting?" never
rescans history.

This is the profiling op behind "is quality drifting per source?",
"is this counter trending up?" — at 100 TB it costs exactly one scan +
one hash aggregate keyed by the (low-cardinality) group column.

Spark's built-in ``regr_slope``/``regr_intercept`` compute the same
fit in streaming double arithmetic; they are NOT used because partial
double sums are partition-order-dependent, which breaks cross-engine
(and cross-run) bit parity — the repo-wide exactness rule.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"

#: the additive statistic columns, in merge order
STAT_COLS = ("n", "sx", "sy", "sxy", "sxx")


def ols_sufficient_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    x: Column,
    y: Column,
) -> DataFrame:
    """Per-key (n, sx, sy, sxy, sxx) — one hash aggregate; every column
    is additive, so partials from disjoint batches SUM to the full-data
    statistics (the property the streaming monitor leans on)."""
    # multiply in decimal, never long: x*x over an epoch-millis x
    # (~1.7e12) wraps int64 silently with ANSI off
    xl = x.cast("long").cast(_DEC)
    yl = y.cast("long").cast(_DEC)
    return df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xl).alias("sx"),
        F.sum(yl).alias("sy"),
        F.sum((xl * yl).cast(_DEC)).alias("sxy"),
        F.sum((xl * xl).cast(_DEC)).alias("sxx"),
    )


def ols_from_stats(stats: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Derive the fit from a sufficient-statistics relation (fresh from
    :func:`ols_sufficient_stats` or read back from the streaming
    monitor's totals table): (keys, n, slope_micros_per_x,
    intercept_micros); both null for degenerate groups (n < 2 or zero
    x-variance)."""
    n = F.col("n").cast(_DEC)
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    ok = (F.col("n") >= 2) & (den != 0)
    return stats.select(
        *key_cols,
        F.col("n"),
        F.when(ok, F.floor(slope + F.lit(0.5)).cast("long"))
        .alias("slope_micros_per_x"),
        F.when(ok, F.floor(intercept + F.lit(0.5)).cast("long"))
        .alias("intercept_micros"),
    )


def grouped_ols(
    df: DataFrame,
    key_cols: Sequence[str],
    x: Column,
    y: Column,
) -> DataFrame:
    """Per-key OLS fit of ``y`` on ``x`` (both integer-valued columns;
    scale y to micros upstream). Returns one row per key:
    (``n``, ``slope_micros_per_x`` = floor(b + 0.5) with y in micros,
    ``intercept_micros`` = floor(a + 0.5)); both null for degenerate
    groups (n < 2 or zero x-variance)."""
    return ols_from_stats(ols_sufficient_stats(df, key_cols, x, y), key_cols)

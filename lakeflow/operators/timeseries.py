"""Hypertable-style time-series resampling: per-key regular grids with
last-observation-carried-forward (LOCF) gap fill — the
``time_bucket_gapfill`` / ``LOCF`` primitive of time-series stores,
Spark-first.

Why not a join per grid point: the naive form ("for each grid instant,
the latest observation at or before it") is an as-of join from the grid
to the observations — per key per grid point. The union+window form
computes ALL grid points' carries in ONE pass: union the (tagged)
observations with the generated grid rows, sort per key by (ts, obs
first), and ``last(value, ignorenulls=True)`` over the preceding frame
carries each observation forward to every later grid instant until the
next observation. One shuffle, keyed by the series key (high
cardinality — one window partition per series, never per grid point).

Exactness: the grid is integer epoch-second arithmetic (floor-aligned
to the step), values are carried verbatim (no cross-row arithmetic), so
any engine — including an ASOF JOIN oracle — reproduces every row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



#: max elements per generated sequence array — a long-lived key at a
#: fine step would otherwise materialize its WHOLE grid as one in-memory
#: array on a single row (a year at 1 s is 31M elements); chunking keeps
#: every generated array bounded while the explode output is identical
_GRID_CHUNK = 65_536


def _grid_rows(bounds: DataFrame, key_col: str, step: int) -> DataFrame:
    """(key, __t) grid instants from the per-key [__g0, __g1] bounds:
    two nested bounded explodes (chunk starts, then instants within the
    chunk) instead of one unbounded sequence per key."""
    span = step * _GRID_CHUNK
    chunks = bounds.select(
        F.col(key_col),
        F.col("__g1"),
        F.explode(
            F.sequence(F.col("__g0"), F.col("__g1"), F.lit(span))
        ).alias("__c"),
    )
    return chunks.select(
        key_col,
        F.explode(
            F.sequence(
                F.col("__c"),
                F.least(F.col("__c") + F.lit(span - step), F.col("__g1")),
                F.lit(step),
            )
        ).alias("__t"),
    )


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    step_seconds: int,
    out_ts: str = "grid_ts",
    out_val: str = "val",
) -> DataFrame:
    """Per-key regular grid from ``floor(min_ts/step)*step`` through
    ``max_ts`` at ``step_seconds``; each grid instant carries the value
    of the LAST observation at-or-before it (null before the first
    observation — leading gaps stay visible). Duplicate observations at
    one (key, ts) instant collapse to the max value first (deterministic
    caller-independent tie rule). Returns (key, grid_ts, val).

    Scale: grid fan-out is a narrow sequence+explode off a 1-row-per-key
    bounds aggregate; the LOCF window partitions by the series key."""
    ep = F.unix_timestamp(F.col(ts_col).cast("timestamp")).cast("long")
    obs = (
        df.select(F.col(key_col), ep.alias("__t"), F.col(val_col).alias("__v"))
        .groupBy(key_col, "__t")
        .agg(F.max("__v").alias("__v"))
        .withColumn("__is_obs", F.lit(1))
    )
    step = int(step_seconds)
    bounds = obs.groupBy(key_col).agg(
        (F.floor(F.min("__t") / step) * step).cast("long").alias("__g0"),
        F.max("__t").alias("__g1"),
    )
    grid = _grid_rows(bounds, key_col, step).select(
        key_col, "__t", F.lit(None).cast(obs.schema["__v"].dataType).alias("__v"),
        F.lit(0).alias("__is_obs"),
    )
    unioned = obs.unionByName(grid)
    # at one instant the observation must sort BEFORE the grid row so
    # the carry includes same-instant observations
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.asc("__t"), F.desc("__is_obs"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__c", F.last("__v", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("__is_obs") == 0).select(
        F.col(key_col),
        F.timestamp_seconds(F.col("__t")).cast("timestamp_ntz").alias(out_ts),
        F.col("__c").alias(out_val),
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    step_seconds: int,
    out_ts: str = "grid_ts",
    out_val: str = "val",
) -> DataFrame:
    """Linear-interpolation resampling (the ``interpolate()`` companion
    to :func:`resample_locf`): each grid instant gets the straight-line
    value between the surrounding observations,
    v = v0 + trunc((v1-v0)*(t-t0)/(t1-t0)) in pure integer arithmetic
    (truncation toward zero — reproducible in any engine); an instant
    coinciding with an observation gets that observation exactly; grid
    points outside the observed range (before the first observation)
    are null, never extrapolated.

    Same single-pass shape as LOCF plus ONE extra window direction: the
    preceding frame carries (t0, v0), the following frame carries
    (t1, v1) — still one shuffle keyed by the series key, no per-grid
    as-of join."""
    ep = F.unix_timestamp(F.col(ts_col).cast("timestamp")).cast("long")
    obs = (
        df.select(F.col(key_col), ep.alias("__t"), F.col(val_col).alias("__v"))
        .groupBy(key_col, "__t")
        .agg(F.max("__v").alias("__v"))
        .withColumn("__is_obs", F.lit(1))
    )
    step = int(step_seconds)
    bounds = obs.groupBy(key_col).agg(
        (F.floor(F.min("__t") / step) * step).cast("long").alias("__g0"),
        F.max("__t").alias("__g1"),
    )
    grid = _grid_rows(bounds, key_col, step).select(
        key_col, "__t", F.lit(None).cast(obs.schema["__v"].dataType).alias("__v"),
        F.lit(0).alias("__is_obs"),
    )
    unioned = obs.unionByName(grid)
    base = Window.partitionBy(key_col).orderBy(F.asc("__t"), F.desc("__is_obs"))
    w_prev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_t = F.when(F.col("__is_obs") == 1, F.col("__t"))
    obs_v = F.when(F.col("__is_obs") == 1, F.col("__v"))
    marked = (
        unioned.withColumn("__t0", F.last(obs_t, ignorenulls=True).over(w_prev))
        .withColumn("__v0", F.last(obs_v, ignorenulls=True).over(w_prev))
        .withColumn("__t1", F.first(obs_t, ignorenulls=True).over(w_next))
        .withColumn("__v1", F.first(obs_v, ignorenulls=True).over(w_next))
    )
    lerp = F.when(F.col("__t0") == F.col("__t"), F.col("__v0")).otherwise(
        F.when(
            F.col("__v0").isNotNull() & F.col("__v1").isNotNull(),
            F.col("__v0")
            + F.expr("(__v1 - __v0) * (__t - __t0) div (__t1 - __t0)"),
        )
    )
    return marked.filter(F.col("__is_obs") == 0).select(
        F.col(key_col),
        F.timestamp_seconds(F.col("__t")).cast("timestamp_ntz").alias(out_ts),
        lerp.cast("long").alias(out_val),
    )


def detect_gaps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tie_col: str,
    min_gap_micros: int,
) -> DataFrame:
    """Missing-data detection per series: every consecutive-observation
    gap of at least ``min_gap_micros`` as (key, gap_start, gap_end,
    gap_micros) — the monitoring primitive behind "sensor went dark" /
    "ingest stalled for this source" alerts, and the inverse of the
    resamplers above (they FILL gaps; this one reports them).

    One per-key ordered window (lag) — the partition is a single
    series, the same bounded shape as sessionization. ``tie_col`` makes
    the order total so equal timestamps are deterministic. Integer
    epoch-micro arithmetic end to end."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = (us - F.lag(us).over(w)).alias("gap_micros")
    return (
        df.select(
            F.col(key_col),
            F.lag(F.col(ts_col)).over(w).alias("gap_start"),
            F.col(ts_col).alias("gap_end"),
            gap,
        )
        .filter(F.col("gap_micros") >= min_gap_micros)
    )

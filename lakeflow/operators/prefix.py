"""Distributed per-group prefix sums (running totals) without the
one-task-per-group funnel.

``sum(v) OVER (PARTITION BY g ORDER BY o)`` sends EVERY row of a group
through ONE task's sorter. Groups here are shards/domains/languages —
low-cardinality keys whose biggest member grows with the corpus, so at
100 TB the window is a straggler by construction (the same shape the
per-query ANN rankings had before ``operators/topk``).

The classic fix is a two-level scan (distributed prefix sum):

1. **Bucket monotonically by the order column.** Per-group
   ``percentile_approx`` boundaries are computed IN THE PLAN (one extra
   aggregate — no driver action, stays lazy) and joined back (small:
   one row per group); a row's bucket is "how many boundaries are
   strictly below my order value" — a codegen'd array filter. Any
   monotone assignment gives IDENTICAL final sums (ties share a bucket
   by construction), so the approximation in the boundaries affects
   only balance, never results.
2. **Per-(group, bucket) totals** via one hash-aggregate (map-side
   combined), then a running sum over the per-bucket totals — a window
   whose input is ≤ n_buckets rows per group.
3. **Within-bucket running sum + bucket offset**: the final window
   partitions by (group, bucket), so no task ever sorts more than
   ~1/n_buckets of a group.

Bit-identical to the single window for any tie-free total order (pass
tie columns), at the cost of one extra aggregate + one small join.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


#: Source-parquet bytes below which one task's window sorter is the
#: cheaper plan (the two-level scan costs an extra aggregate + two
#: joins of pure overhead at small scale — measured +0.25-0.3 s per
#: query at sf0.1 in BENCH_r05).
SINGLE_TASK_BYTES = 64 * 1024 * 1024


def auto_buckets(df: DataFrame, n_buckets: int = 32) -> int:
    """Derive the prefix-sum bucket count from the plan's scanned
    bytes — METADATA only (``inputFiles`` + file sizes), no job runs.
    Below :data:`SINGLE_TASK_BYTES` of source data the whole relation
    fits one task's sorter comfortably, so the plain window
    (``n_buckets=1``) wins; above it — or when the source bytes are
    unknowable (in-memory frames, remote filesystems) — the
    scale-safe bucketed path. The switch only picks a PLAN; results
    are bit-identical either way."""
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return n_buckets
    if not files:
        return n_buckets
    total = 0
    for f in files:
        p = urlparse(f)
        if p.scheme not in ("", "file"):
            return n_buckets  # remote source: size lookup not local
        try:
            total += os.path.getsize(p.path or f)
        except OSError:
            return n_buckets
    return 1 if total < SINGLE_TASK_BYTES else n_buckets


def bucketed_running_sum(
    df: DataFrame,
    group_col: str,
    order_col: Column | str,
    tie_cols: Sequence[Column | str],
    val_col: Column | str,
    out_col: str = "run",
    n_buckets: int | None = None,
    accuracy: int = 1_000,
) -> DataFrame:
    """``df`` + ``out_col`` = inclusive running sum of ``val_col`` per
    ``group_col`` in ``(order_col, *tie_cols)`` order — equivalent to
    the per-group ordered window, never feeding a whole group through
    one task. ``order_col`` must be numeric (hashes, ids, micro-ints);
    ``(order_col, *tie_cols)`` must be a total order within a group.

    ``n_buckets=None`` (default) sizes the plan from the source bytes
    via :func:`auto_buckets`; ``n_buckets=1`` is the explicit plain
    single-window plan (identical results, cheaper below
    :data:`SINGLE_TASK_BYTES`)."""
    order_c = F.col(order_col) if isinstance(order_col, str) else order_col
    val_c = F.col(val_col) if isinstance(val_col, str) else val_col
    if n_buckets is None:
        n_buckets = auto_buckets(df)
    if n_buckets <= 1:
        ties = [F.col(t) if isinstance(t, str) else t for t in tie_cols]
        w = (
            Window.partitionBy(group_col)
            .orderBy(order_c.asc(), *[t.asc() for t in ties])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(
            out_col, F.sum(val_c.cast("long")).over(w).cast("long")
        )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.groupBy(group_col).agg(
        F.percentile_approx(order_c, probs, accuracy).alias("__bnds")
    ).withColumnRenamed(group_col, "__bg")
    # joins back to per-group relations use NULL-SAFE equality: groupBy
    # keeps a NULL group, but a plain equi-join would silently DROP
    # every null-keyed row (the window form it replaces kept them)
    keyed = (
        df.withColumn("__o", order_c.cast("double"))
        .withColumn("__v", val_c.cast("long"))
        .join(bounds, F.col(group_col).eqNullSafe(F.col("__bg")))
        .withColumn(
            "__b",
            F.size(F.filter(F.col("__bnds"), lambda x: x.cast("double") < F.col("__o"))),
        )
        .drop("__bnds", "__bg")
    )
    totals = keyed.groupBy(group_col, "__b").agg(F.sum("__v").alias("__bt"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        totals.select(
            group_col,
            "__b",
            F.coalesce(F.sum("__bt").over(w_off), F.lit(0)).alias("__off"),
        )
        .withColumnRenamed(group_col, "__og")
        .withColumnRenamed("__b", "__ob")
    )
    ties = [F.col(t) if isinstance(t, str) else t for t in tie_cols]
    w_in = (
        Window.partitionBy(group_col, "__b")
        .orderBy(order_c.asc(), *[t.asc() for t in ties])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        keyed.join(
            offsets,
            F.col(group_col).eqNullSafe(F.col("__og"))
            & (F.col("__b") == F.col("__ob")),
        )
        .withColumn(out_col, (F.sum("__v").over(w_in) + F.col("__off")).cast("long"))
        .drop("__o", "__v", "__b", "__off", "__og", "__ob")
    )

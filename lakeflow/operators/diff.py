"""Snapshot diff — a change data feed computed from two table states.

CDC-consuming systems (downstream incremental loads, search-index
refreshers, cache invalidation, audit) want "what changed between
version A and version B", but plain parquet tables — and the staged
merge commits in :mod:`lakeflow.sinks.merge` — only store snapshots.
This operator reconstructs the change feed relationally: one
null-safe full outer join on the key, one codegen comparison of the
non-key columns.

Scale shape: the join shuffles both snapshots on the key exactly once
(co-located for free if both versions were written bucketed by key);
the value comparison is a narrow projection. For an incremental
pipeline this replaces re-processing the full new snapshot with
processing |changes| rows — typically orders of magnitude smaller.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], emit_old: bool = False
) -> DataFrame:
    """Change feed from ``old`` → ``new`` keyed by ``keys``: one row per
    inserted ('I'), deleted ('D'), or value-changed ('U') key, carrying
    the NEW values for I/U and the OLD values for D. Unchanged keys emit
    nothing. Both snapshots must share a schema; comparisons are
    null-safe (NULL → NULL is unchanged).

    ``emit_old=True`` additionally carries every value column's
    PRE-image as ``__old_<col>`` (null for I) — what an incremental
    aggregate consumer needs to RETRACT a U/D row's old contribution
    (``streaming/cdf.py``); plain CDC consumers skip the wide form."""
    val_cols = [c for c in new.columns if c not in keys]
    # explicit presence markers, NOT key-isNotNull probes: the join is
    # deliberately null-safe on the keys, so a row whose key columns
    # are all NULL is still a real row on its side — key nullness says
    # nothing about which side matched
    o = old.select(
        F.lit(1).alias("__op"),
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in val_cols],
    )
    n = new.select(
        F.lit(1).alias("__np"),
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in val_cols],
    )
    cond = reduce(
        lambda a, b: a & b,
        [o[f"__ok_{k}"].eqNullSafe(n[f"__nk_{k}"]) for k in keys],
    )
    j = o.join(n, cond, "full_outer")
    in_old = j["__op"].isNotNull()
    in_new = j["__np"].isNotNull()
    changed = (
        reduce(
            lambda a, b: a | b,
            [~j[f"__o_{c}"].eqNullSafe(j[f"__n_{c}"]) for c in val_cols],
        )
        if val_cols
        else F.lit(False)
    )
    op = (
        F.when(~in_old, F.lit("I"))
        .when(~in_new, F.lit("D"))
        .when(changed, F.lit("U"))
    )
    out_keys = [
        F.coalesce(j[f"__nk_{k}"], j[f"__ok_{k}"]).alias(k) for k in keys
    ]
    out_vals = [
        F.when(~in_new, j[f"__o_{c}"]).otherwise(j[f"__n_{c}"]).alias(c)
        for c in val_cols
    ]
    old_vals = (
        [
            F.when(in_old, j[f"__o_{c}"]).alias(f"__old_{c}")
            for c in val_cols
        ]
        if emit_old
        else []
    )
    return (
        j.select(op.alias("op"), *out_keys, *out_vals, *old_vals)
        .where(F.col("op").isNotNull())
    )

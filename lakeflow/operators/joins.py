"""Join operators Spark lacks as built-ins: as-of join and time-range
self-join (SURVEY §2.5 J4 — absent in the reference, implied by its
event-to-funnel attribution needs).

Both are implemented to survive 100 TB:

- ``asof_join`` uses the union+window technique — ONE shuffle on the key,
  no row-multiplying join, no per-key blowup when the right side has many
  rows per key. A naive ``join + row_number`` materializes |left|x|right|
  rows per key before filtering; this never does.
- ``range_self_join`` uses time bucketing — each row joins only its own
  and neighboring buckets, turning an O(n^2)-per-key nested loop into an
  equi-join Catalyst can shuffle-hash. Skewed keys are handled by AQE
  skew-join splitting (enabled in session.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right_ts <= left_ts`` and matching key(s) ("backward" as-of).

    Union both sides, sort within key by (ts, side, tiebreaks) and carry
    the most recent right payload forward with ``last(ignorenulls)`` over
    an unbounded-preceding frame. Right rows sort before left rows at
    equal timestamps, so an exact-tie right row IS visible to the left
    row (<= semantics). ``tiebreak_cols`` orders simultaneous right rows
    (the later-sorted one wins — pass e.g. a monotonically increasing id
    for deterministic latest-wins).

    The payload travels as ONE struct column: match detection is the
    struct's own nullness (never a payload field's — a right row whose
    payload columns are all legitimately NULL still matches), and the
    carried payload is atomic (all fields from the SAME right row —
    per-column last(ignorenulls) could stitch fields from different
    rows when some fields are null).

    Single shuffle on ``on``; scales linearly in |left|+|right|.
    """
    from pyspark.sql.types import StructField, StructType

    keys = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in left.columns]
    pay_type = StructType(
        [StructField(p, right.schema[p].dataType, True) for p in payload_cols]
    )

    l_tag = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(pay_type).alias("__pay"),
        *[F.lit(None).cast(right.schema[t].dataType).alias(f"__t_{t}") for t in tiebreak_cols],
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(p) for p in payload_cols]).alias("__pay"),
        *[F.col(t).alias(f"__t_{t}") for t in tiebreak_cols],
    ).select(*l_tag.columns)  # align column order for unionByName-safety

    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), *[F.col(f"__t_{t}").asc() for t in tiebreak_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("__side"),
        F.last(F.col("__pay"), ignorenulls=True).over(w).alias("__pay"),
    )
    out = carried.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__pay").isNotNull())
    return out.select(
        *[F.col(c) for c in lcols],
        *[F.col("__pay").getField(p).alias(p) for p in payload_cols],
    )


def range_self_join(
    df: DataFrame,
    key: str,
    ts: str,
    max_gap_seconds: int,
    id_col: str,
) -> DataFrame:
    """All pairs of rows sharing ``key`` whose timestamps are within
    ``max_gap_seconds``, emitted once (``id_a < id_b``).

    Bucketing: rows land in floor(epoch_us / gap_us) buckets; two rows
    within the gap are always in the same or adjacent buckets. The left
    side expands to buckets {b-1, b, b+1} and joins equi on the right
    row's own bucket, so every qualifying (id_a < id_b) pair meets
    exactly once. Output columns: key, ``<id>_a``, ``<id>_b``,
    ``gap_us`` (signed, ts_b - ts_a).
    """
    gap_us = max_gap_seconds * 1_000_000
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    base = df.select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("__id"),
        us.alias("__us"),
        F.floor(us / F.lit(gap_us)).alias("__b"),
    )
    lhs = base.select(
        "__k",
        "__id",
        "__us",
        F.explode(F.array(F.col("__b") - 1, F.col("__b"), F.col("__b") + 1)).alias("__jb"),
    )
    rhs = base.select(
        F.col("__k").alias("__k2"),
        F.col("__id").alias("__id2"),
        F.col("__us").alias("__us2"),
        F.col("__b").alias("__jb2"),
    )
    pairs = lhs.join(
        rhs, (F.col("__k") == F.col("__k2")) & (F.col("__jb") == F.col("__jb2")), "inner"
    )
    return pairs.filter(
        (F.col("__id") < F.col("__id2"))
        & (F.abs(F.col("__us2") - F.col("__us")) <= F.lit(gap_us))
    ).select(
        F.col("__k").alias(key),
        F.col("__id").alias(f"{id_col}_a"),
        F.col("__id2").alias(f"{id_col}_b"),
        (F.col("__us2") - F.col("__us")).alias("gap_us"),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    keys: list[str] | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join without a nested loop: each interval is
    replicated over the fixed-width time buckets it covers
    (``sequence`` + explode — fan-out = interval length / bucket), each
    point carries its single bucket, and Catalyst plans an EQUI join on
    (keys, bucket) with the exact ``start <= point <= end`` predicate
    as a post-filter. Every qualifying pair meets exactly once (a point
    occupies one bucket; an interval lists each bucket once), so no
    dedup pass is needed.

    This is the two-table generalization of :func:`range_self_join` —
    sessions x events, validity windows x observations, campaign
    windows x conversions. Pick ``bucket_seconds`` near the TYPICAL
    interval length: too small multiplies interval replicas, too large
    fills buckets with non-matching points (the filter stays correct
    either way). At 100 TB both sides shuffle once on (keys, bucket);
    skewed buckets are ordinary AQE-splittable join skew.

    Column names must not collide between the two inputs (rename
    first); returns all point columns + all interval columns.
    """
    overlap = set(points.columns) & set(intervals.columns) - set(keys or [])
    if overlap:
        raise ValueError(
            f"rename colliding columns before interval_join: {sorted(overlap)}"
        )
    w_us = bucket_seconds * 1_000_000
    p_us = F.unix_micros(F.col(point_ts).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_ts).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_ts).cast("timestamp"))
    p = points.withColumn("__pb", F.floor(p_us / F.lit(w_us)))
    i = intervals.withColumn(
        "__ib",
        F.explode(
            F.sequence(F.floor(s_us / F.lit(w_us)), F.floor(e_us / F.lit(w_us)))
        ),
    )
    cond = p["__pb"] == i["__ib"]
    for k in keys or []:
        cond = cond & (p[k] == i[k])
    joined = p.join(i, cond, "inner").filter(
        (p_us >= s_us) & (p_us <= e_us)
    )
    out_cols = [p[c] for c in points.columns] + [
        i[c] for c in intervals.columns if c not in (keys or [])
    ]
    return joined.select(*out_cols)

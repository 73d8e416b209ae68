"""Re-aggregable rollups: hourly partial aggregates that merge into
any coarser grain without rescanning raw data.

The hypertable/continuous-aggregate pattern: a 100 TB event stream is
aggregated ONCE into per-(key, hour) partials, and every dashboard /
report / drift monitor over days, weeks, or arbitrary ranges is served
by merging partials — O(hours in range), not O(raw events). That only
works if every measure is MERGEABLE:

- counts and sums: additive — trivially re-aggregable.
- min/max: idempotent semilattice ops — re-aggregable.
- distinct counts: NOT additive (users active in two hours collide), so
  the partial must be a mergeable sketch. We store a Datasketches HLL
  per partial (``hll_sketch_agg``) and merge with ``hll_union_agg`` —
  union is exact on the sketch domain, so the merged estimate equals
  what a single-pass sketch of the raw range would give, with the same
  ±~1.6% (lgK=12) error contract.

The partial table is itself a DataFrame — persist it with the ordinary
sinks, append new hours incrementally (``sinks.merge.merge_additive``
handles late data for the additive measures), and compact/Z-order it
like any other table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hourly_partials(
    events: DataFrame,
    ts_col: str,
    key_cols: list[str],
    sum_col: Column,
    distinct_col: str,
    lgk: int = 12,
) -> DataFrame:
    """One scan of the raw events → per-(key, hour) partial aggregates:
    additive ``n``/``sum_v``, min/max event time, and an HLL sketch of
    ``distinct_col`` (binary, mergeable). ``sum_col`` must be an exact
    integer expression (cents/micros) so re-aggregation is drift-free."""
    hour = F.date_trunc("hour", F.col(ts_col)).alias("hour_start")
    return events.groupBy(*key_cols, hour).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(sum_col).alias("sum_v"),
        F.min(ts_col).alias("min_ts"),
        F.max(ts_col).alias("max_ts"),
        F.hll_sketch_agg(F.col(distinct_col).cast("string"), F.lit(lgk)).alias(
            "hll"
        ),
    )


def merge_to_grain(
    partials: DataFrame, key_cols: list[str], grain: str = "day"
) -> DataFrame:
    """Merge hourly partials to a coarser grain: sums add, extrema
    re-min/max, sketches union. Scans #partials rows — never the raw
    events."""
    bucket = F.date_trunc(grain, F.col("hour_start")).alias("bucket_start")
    return partials.groupBy(*key_cols, bucket).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_ts").alias("min_ts"),
        F.max("max_ts").alias("max_ts"),
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("distinct_est"),
    )


def hourly_bitmap_partials(
    events: DataFrame,
    ts_col: str,
    key_cols: list[str],
    distinct_col: str,
) -> DataFrame:
    """EXACT mergeable distinct counts for integer-keyed domains: the
    per-(key, hour) partial is a roaring-style bitmap bucket —
    ``bitmap_construct_agg(bitmap_bit_position(v))`` grouped by
    ``bitmap_bucket_number(v)`` — instead of an HLL sketch. Bitmaps OR
    together losslessly, so any re-aggregation grain reproduces
    ``COUNT(DISTINCT)`` exactly; the cost is state proportional to the
    value domain per bucket (Spark buckets are 32k bits / 4 KB max),
    where HLL is fixed-size but approximate. Use bitmaps for bounded
    int ids (user ids, doc ids), HLL for unbounded/string domains."""
    hour = F.date_trunc("hour", F.col(ts_col)).alias("hour_start")
    v = F.col(distinct_col).cast("long")
    return events.groupBy(
        *key_cols, hour, F.bitmap_bucket_number(v).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.bitmap_construct_agg(F.bitmap_bit_position(v)).alias("bm"),
    )


def merge_bitmap_to_grain(
    partials: DataFrame, key_cols: list[str], grain: str = "day"
) -> DataFrame:
    """Merge bitmap partials to a coarser grain: OR the bitmaps per
    bucket, count bits, sum across buckets — exact distinct at every
    grain, never rescanning raw events."""
    bucket_start = F.date_trunc(grain, F.col("hour_start")).alias("bucket_start")
    per_bucket = partials.groupBy(*key_cols, bucket_start, "bucket").agg(
        F.sum("n").alias("n"),
        F.bitmap_count(F.bitmap_or_agg("bm")).alias("nd"),
    )
    return per_bucket.groupBy(*key_cols, "bucket_start").agg(
        F.sum("n").alias("n"),
        F.sum("nd").alias("distinct_exact"),
    )

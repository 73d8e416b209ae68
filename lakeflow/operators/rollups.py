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

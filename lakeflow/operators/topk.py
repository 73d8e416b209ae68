"""Bounded per-key top-k — the two-phase heap-merge shape.

``Window.partitionBy(key).orderBy(v)`` + ``row_number`` funnels EVERY
row of a key through ONE task's sorter. With few keys — an ANN query
set of 10 against a billion-row corpus — each window partition is
O(corpus) rows through a single task: the exact straggler shape this
repo eliminated from ``vocab_heavy_hitters`` (global variant) in round
4. This module is the per-key variant:

1. **Partial top-k per input partition**: group on
   ``(key, spark_partition_id())`` and reduce each group to
   ``slice(array_sort(collect_list(struct(v, tie))), 1, k)``. Every
   group's rows come from exactly one input partition, so no task ever
   holds more than one partition's share of one key, and the shuffle
   distributes a hot key across as many reducers as there are input
   partitions instead of one.
2. **Bounded final rank**: explode the per-partition winners —
   ≤ partitions × k rows per key — and run the ordinary
   ``row_number`` window over that tiny pooled relation.

The result is IDENTICAL to the single-window form: ``array_sort`` over
``struct(v, tie)`` is the same lexicographic total order the window's
``orderBy(v, tie)`` uses, and a key's global top-k is always contained
in the union of its per-partition top-ks. Exact-integer values keep it
bit-reproducible and SQL-oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_key(
    scored: DataFrame,
    key: str,
    val_col: str,
    tie_col: str,
    k: int,
    rank_col: str = "rnk",
    descending: bool = False,
) -> DataFrame:
    """Top-``k`` rows per ``key`` by ``val_col`` (ties broken by
    ``tie_col`` ascending), with a 1-based ``rank_col`` — equivalent to
    ``row_number() OVER (PARTITION BY key ORDER BY val [DESC], tie)
    <= k`` but never feeding a whole key through one task. ``tie_col``
    must be unique within a key (it is the deterministic tie-break).
    ``descending=True`` ranks largest-first by negating the partial
    heaps' sort key (``val_col`` must therefore not be Long.MIN_VALUE —
    fine for every micro-int domain here). Returns
    (key, tie_col, val_col, rank_col)."""
    sort_v = (-F.col(val_col)) if descending else F.col(val_col)
    part = scored.groupBy(key, F.spark_partition_id().alias("__p")).agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        sort_v.alias("s"),
                        F.col(tie_col).alias("i"),
                        F.col(val_col).alias("v"),
                    )
                )
            ),
            1,
            k,
        ).alias("__top")
    )
    pooled = part.select(key, F.explode("__top").alias("t")).select(
        key, F.col("t.i").alias(tie_col), F.col("t.v").alias(val_col)
    )
    order = F.desc(val_col) if descending else F.asc(val_col)
    w = Window.partitionBy(key).orderBy(order, F.asc(tie_col))
    return pooled.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )

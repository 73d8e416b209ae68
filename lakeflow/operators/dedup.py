"""Deduplication operators.

Reference semantics (SURVEY §2.7 D1): ``sort_values('timestamp')`` +
``drop_duplicates([...], keep='last')`` at
``/root/reference/card_funnel/kafka_s3_to_silver.py:28-30`` — keep the
newest record per key. Spark's ``dropDuplicates`` keeps an ARBITRARY row
(partition-order dependent), so the correct distributed port is a window
``row_number`` with an explicit total order — deterministic under any
partitioning, any AQE re-plan, any cluster size.

Beyond the reference, the LLM-pipeline dedup family lives here too:
exact content dedup, and (in ``lakeflow.operators.similarity``) MinHash/
SimHash near-dup. All are single-shuffle group-by designs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_wins(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Keep the newest row per key; ties broken by ``tiebreak_cols``
    descending (pass a unique id for full determinism).

    One shuffle on ``keys``; with AQE, skewed hot keys are split.
    """
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), *[F.col(t).desc() for t in tiebreak_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(
    df: DataFrame,
    content_cols: Sequence[str],
    id_col: str,
) -> DataFrame:
    """Exact content dedup: one representative row (minimum id) per
    distinct content fingerprint, with the duplicate count.

    The fingerprint is md5 over the concatenated content columns, so the
    shuffle key is a fixed-width hash, not the (potentially huge) content
    itself — at 100 TB you never want document bodies as shuffle keys.
    Returns columns: fingerprint, keep_<id>, n_copies.
    """
    fp = F.md5(F.concat_ws("", *[F.col(c) for c in content_cols]))
    return (
        df.select(fp.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias(f"keep_{id_col}"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )

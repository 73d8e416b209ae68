"""Batch merge patterns: upsert + SCD2 history (CDC emulation).

The reference's "upsert" was drop-and-recreate or append-only tables
(SURVEY §2.10); Delta/Iceberg ``MERGE INTO`` is the production path.
On plain parquet (this environment) the guide-standard emulation is
anti-join + union + window, which these helpers implement:

- ``merge_upsert``: latest-wins row replacement per key (same semantics
  as the streaming foreachBatch sink, batch-callable).
- ``scd2_merge``: slowly-changing-dimension type 2 — every change
  becomes a versioned row with [valid_from, valid_to) and an
  ``is_current`` flag; re-applying the same updates is a no-op
  (idempotent CDC replays).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakeflow.operators.dedup import latest_wins


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str,
) -> None:
    try:
        existing = spark.read.parquet(target_path)
        merged = existing.unionByName(updates, allowMissingColumns=True)
    except Exception:
        merged = updates
    out = latest_wins(merged, list(keys), order_col)
    out.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_path)


def scd2_merge(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    change_ts: str,
) -> None:
    """Merge change rows into an SCD2 history table.

    ``updates``: one row per (key, change_ts) with the new attribute
    values. History rows carry valid_from = change_ts, valid_to = next
    version's valid_from (null while current), is_current.
    """
    versions = updates.withColumn("valid_from", F.col(change_ts))
    try:
        existing = spark.read.parquet(target_path).drop(
            "valid_to", "is_current"
        )
        versions = existing.unionByName(versions, allowMissingColumns=True)
    except Exception:
        pass
    # idempotence: identical (key, valid_from) replays collapse
    versions = latest_wins(versions, [*keys, "valid_from"], change_ts)
    w = Window.partitionBy(*keys).orderBy("valid_from")
    out = versions.withColumn(
        "valid_to", F.lead("valid_from").over(w)
    ).withColumn("is_current", F.col("valid_to").isNull())
    out.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_path)

"""Sequence packing for pretraining batch construction.

GPT-style "concat-and-chunk" packing: within a shard, documents are
concatenated in a deterministic order and the token stream is cut into
fixed-size sequences. This operator computes each document's placement
— which sequence its first token lands in and at what offset — as a
pure window expression: a running token sum partitioned by shard.

Scale shape: the window partitions by the SHARD column, never globally
— a global running sum would plan as a single-partition window (one
task owns 100 TB). Shards (source, file, date bucket …) bound the
per-partition work exactly the way real packing jobs shard their
input. All arithmetic is integer (long div/mod), so any engine
reproduces placements bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    shard_col: str,
    budget: int,
) -> DataFrame:
    """Assign concat-and-chunk placements: per shard (ordered by id),
    ``start`` = running token sum before the doc, ``seq_id`` =
    start div budget, ``offset_in_seq`` = start mod budget. A doc may
    straddle sequence boundaries (standard chunk packing); ``seq_id``
    is the sequence holding its FIRST token. Returns the input keys
    plus (start_token, seq_id, offset_in_seq)."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(token_col).over(w) - F.col(token_col)).cast("long")
    return df.select(
        F.col(id_col),
        F.col(shard_col),
        F.col(token_col).cast("long").alias(token_col),
        start.alias("start_token"),
    ).select(
        id_col,
        shard_col,
        token_col,
        "start_token",
        F.expr(f"start_token div {budget}").alias("seq_id"),
        (F.col("start_token") % budget).alias("offset_in_seq"),
    )

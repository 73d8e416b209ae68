"""Sequence packing for pretraining batch construction.

GPT-style "concat-and-chunk" packing: within a shard, documents are
concatenated in a deterministic order and the token stream is cut into
fixed-size sequences. This operator computes each document's placement
— which sequence its first token lands in and at what offset — as a
pure window expression: a running token sum partitioned by shard.

Scale shape: the running sum is the DISTRIBUTED prefix sum of
``operators/prefix.py`` — per-shard quantile buckets computed in the
plan, per-bucket totals, bucket offsets, within-bucket windows — so no
task ever sorts more than ~1/n_buckets of a shard. (A plain
per-shard window bounds the work only while shards stay small; the
biggest shard grows with the corpus, and ORDER BY inside a window
partition is a single task.) All arithmetic is integer (long
div/mod), so any engine reproduces placements bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakeflow.operators.prefix import bucketed_running_sum


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    shard_col: str,
    budget: int,
    n_buckets: int | None = None,
) -> DataFrame:
    """Assign concat-and-chunk placements: per shard (ordered by id),
    ``start`` = running token sum before the doc, ``seq_id`` =
    start div budget, ``offset_in_seq`` = start mod budget. A doc may
    straddle sequence boundaries (standard chunk packing); ``seq_id``
    is the sequence holding its FIRST token. Returns the input keys
    plus (start_token, seq_id, offset_in_seq)."""
    run = bucketed_running_sum(
        df.select(
            F.col(id_col), F.col(shard_col), F.col(token_col).cast("long").alias(token_col)
        ),
        shard_col,
        id_col,
        (),
        token_col,
        out_col="__run",
        n_buckets=n_buckets,
    )
    start = (F.col("__run") - F.col(token_col)).cast("long")
    return run.select(
        F.col(id_col),
        F.col(shard_col),
        F.col(token_col),
        start.alias("start_token"),
    ).select(
        id_col,
        shard_col,
        token_col,
        "start_token",
        F.expr(f"start_token div {budget}").alias("seq_id"),
        (F.col("start_token") % budget).alias("offset_in_seq"),
    )


def chunk_windows(
    df: DataFrame,
    n_tokens_col: str,
    size: int = 64,
    overlap: int = 16,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Per-document sliding-window chunking: split each doc into
    windows of ``size`` tokens advancing by ``size - overlap`` —
    the context-window primitive (RAG indexing, long-doc pretraining)
    complementing cross-doc :func:`pack_sequences`. Emits one row per
    (doc, chunk): chunk_id, start_token, chunk_len (the final window
    may be partial). Pure integer arithmetic + one explode — a narrow
    map over the scan, no shuffle, no state; chunk counts are a
    closed-form function of the token count so the fan-out is exact
    and reproducible in any engine."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap
    n = F.col(n_tokens_col).cast("long")
    # windows needed to cover all tokens: 1 + ceil(max(0, n-size)/step)
    n_chunks = F.lit(1) + F.expr(
        f"(greatest(0L, {n_tokens_col} - {size}) + {step - 1}) div {step}"
    )
    out = df.withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1)))
    )
    start = F.col("chunk_id") * F.lit(step)
    return out.select(
        *id_cols,
        F.col(n_tokens_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("start_token"),
        F.least(F.lit(size).cast("long"), n - start).alias("chunk_len"),
    )

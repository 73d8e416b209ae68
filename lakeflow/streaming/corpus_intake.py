"""Streaming document intake for training corpora (SURVEY §2.10 +
§2.12 composed).

The batch corpus-prep funnel (q_corpus_prep) as a continuously-running
stream: documents arrive as NDJSON files, are quality-scored and
language-tagged AT THE SCAN (pure codegen expressions — the stream's
throughput is the file source's), exact-deduped on a content
fingerprint within the watermark (state-bounded), and merged into a
silver table keyed by fingerprint so duplicates arriving ACROSS
micro-batches also collapse.

Scale notes: the only stateful operator is the within-watermark dedup,
whose state is bounded by (arrival rate × watermark); the cross-batch
dedup is delegated to the keyed upsert (Delta MERGE in production, the
parquet latest-wins emulation here), so no unbounded dedup state ever
accumulates in the stream itself.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from lakeflow.operators.text import lang_pred, lang_scores, quality_score, token_count
from lakeflow.streaming.pipeline import (
    dedup_within_watermark,
    stream_ndjson,
    upsert_foreach_batch,
)


def stream_corpus_intake(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    target_path: str,
    checkpoint: str,
    min_quality_micros: int = 500_000,
    watermark: str = "1 hour",
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
):
    """Start the intake stream; returns the StreamingQuery.

    Stages: scan-time scoring → quality threshold → within-watermark
    exact dedup on the content fingerprint → keyed upsert (fingerprint
    is the merge key, so a re-arriving duplicate replaces rather than
    duplicates)."""
    stream = stream_ndjson(spark, path, schema)
    scores = lang_scores(text_col)
    scored = stream.select(
        F.col(id_col),
        F.col(ts_col),
        F.col(text_col),
        F.md5(text_col).alias("fp"),
        token_count(text_col).cast("long").alias("n_tokens"),
        F.floor(quality_score(text_col) * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("quality_micros"),
        lang_pred(scores).alias("pred_lang"),
    )
    kept = scored.filter(F.col("quality_micros") >= min_quality_micros)
    deduped = dedup_within_watermark(kept, ["fp"], ts_col, watermark)
    return upsert_foreach_batch(
        deduped, target_path, ["fp"], ts_col, checkpoint
    )

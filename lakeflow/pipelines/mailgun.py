"""Mailgun delivered-events import — the reference's richest pipeline
(`/root/reference/card_funnel/emails_import_mailgun.py`, SURVEY §3.1),
re-expressed as ONE lazy Spark job.

Reference shape: sequential per-file loop over 25 partition prefixes,
each file S3-GET + double json.loads + pandas filters + COPY. Spark
shape: a single partitioned scan (``.../partition=*/`` discovered and
pruned automatically, ``modifiedAfter`` replacing the last_modified
cursor) → flatten → tag/time filters → cast → sanitize; executors
parallelize over file splits, the 25-partition loop disappears.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeflow.operators.flatten import (
    empty_collections_to_null,
    flatten,
    sanitize_columns,
)
from lakeflow.pipelines._common import require_columns
from lakeflow.sources.ndjson import read_double_encoded_ndjson

def import_mailgun_events(
    spark: SparkSession,
    path: str | list[str],
    relevant_tags: list[str],
    start: datetime | None = None,
    schema=None,
) -> DataFrame:
    """``relevant_tags`` is deployment config with no default: the
    reference hardcodes its own three notification-event tag strings
    (emails_import_mailgun.py:13-15); each deployment passes its own."""
    if not relevant_tags:
        raise ValueError("relevant_tags is required (deployment-specific)")
    tags = relevant_tags
    # S5 double-decode scan (emails_import_mailgun.py:20 via s3_utils.py:73-78)
    df = read_double_encoded_ndjson(spark, path, schema)
    require_columns(df, ["tags", "timestamp"], "mailgun import")
    # N1 flatten with collision-prefix (emails_import_mailgun.py:21)
    nested = [c for c in ("delivery-status", "message") if c in df.columns]
    df = flatten(df, nested)
    # P6 any-tag-in-set filter (emails_import_mailgun.py:22-26) — the
    # reference expands tags positionally; arrays_overlap needs no expansion
    df = df.filter(
        F.arrays_overlap(F.col("tags"), F.array([F.lit(t) for t in tags]))
    )
    # P8 incremental cutoff on epoch seconds (emails_import_mailgun.py:27)
    if start is not None:
        df = df.filter(F.col("timestamp") >= F.lit(start.timestamp()))
    # F4 epoch-seconds -> naive timestamp (emails_import_mailgun.py:28-29)
    df = df.withColumn(
        "event_ts",
        F.timestamp_seconds(F.col("timestamp")).cast("timestamp_ntz"),
    ).drop("timestamp")
    # N6 empty collections -> null (utils/sql_utils.py:56)
    df = empty_collections_to_null(df)
    # P3 name sanitize (emails_import_mailgun.py:39-40)
    return sanitize_columns(df)

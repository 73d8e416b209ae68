"""Kafka topic-dump scan (SURVEY §2.1 S7).

The reference reads NDJSON dumps with envelope
``topic, partition, offset, key, value`` and flattens ``value``
(`card_funnel/kafka_s3_to_silver.py:8-18`). Batch form here; the live
form is ``spark.readStream.format('kafka')`` +
``from_json(value.cast('string'), schema)`` (lakeflow.streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from lakeflow.operators.flatten import flatten
from lakeflow.sources.ndjson import read_ndjson

ENVELOPE_COLS = ("topic", "partition", "offset", "key")


def read_kafka_topic_dump(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType | str | None = None,
    keep_envelope: bool = False,
) -> DataFrame:
    """Read a topic dump, flatten the payload (collision-safe), and by
    default drop the envelope (reference P1: ``vals_cols`` filter at
    `kafka_s3_to_silver.py:16-18`)."""
    raw = read_ndjson(spark, path, schema)
    flat = flatten(raw, ["value"])
    if not keep_envelope:
        flat = flat.drop(*[c for c in ENVELOPE_COLS if c in flat.columns])
    return flat

"""Live Kafka structured-streaming source (SURVEY §2.1 S7, live form).

The batch twin (``sources/kafka_dump.read_kafka_topic_dump``) replays
NDJSON topic dumps with envelope ``topic, partition, offset, key,
value``; this module is the SAME contract against a live broker:
``spark.readStream.format("kafka")`` + ``from_json`` on the value,
projected to the identical column layout — a pipeline written against
the dump replay runs unchanged against the stream.

ENVIRONMENT LIMITATION (documented): the ``spark-sql-kafka``
connector JAR and a broker are not available in this sandbox, so the
plan construction is import-guarded and raises a clear, actionable
error instead of Spark's bare "Failed to find data source: kafka".
The projection logic itself is exercised in tests through the batch
path (same expressions over a static DataFrame with the connector's
output schema), so only the connector boundary is unexercised here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: columns the kafka connector emits (its fixed output schema)
CONNECTOR_COLS = (
    "key", "value", "topic", "partition", "offset", "timestamp",
    "timestampType",
)

KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"


def parse_kafka_stream(
    raw: DataFrame,
    value_schema: StructType | str,
    keep_envelope: bool = False,
) -> DataFrame:
    """Project a kafka-connector relation (streaming OR a static frame
    with the same columns) to the dump-replay contract: JSON-decode the
    binary ``value`` against ``value_schema`` and flatten its fields to
    top level; ``keep_envelope=True`` retains
    (topic, partition, offset, key, kafka_ts). Pure expressions — the
    same logic serves the live stream and tests."""
    parsed = raw.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("__v"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
    )
    out = parsed.select(
        *(
            ["topic", "partition", "offset", "key", "kafka_ts"]
            if keep_envelope
            else []
        ),
        F.col("__v.*"),
    )
    return out


def stream_kafka_topic(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    value_schema: StructType | str,
    starting_offsets: str = "earliest",
    keep_envelope: bool = False,
    **options: str,
) -> DataFrame:
    """Open the live Kafka source and project it to the dump-replay
    contract. Raises a clear RuntimeError when the connector JAR is
    absent (this sandbox) — add ``--packages {KAFKA_PACKAGE}`` in a
    real deployment. Extra ``options`` pass through to the reader
    (maxOffsetsPerTrigger, kafka.* security settings, ...)."""
    from pyspark.errors import AnalysisException

    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        raw = reader.load()
    except AnalysisException as e:
        raise RuntimeError(
            "the spark-sql-kafka connector is not on the classpath — "
            f"launch with --packages {KAFKA_PACKAGE} (and a reachable "
            f"broker at {bootstrap_servers!r})"
        ) from e
    return parse_kafka_stream(raw, value_schema, keep_envelope)

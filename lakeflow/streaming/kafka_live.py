"""Live Kafka structured-streaming source (SURVEY §2.1 S7, live form).

The batch twin (``sources/kafka_dump.read_kafka_topic_dump``) replays
NDJSON topic dumps with envelope ``topic, partition, offset, key,
value``; this module is the SAME contract against a live broker:
``spark.readStream.format("kafka")`` + ``from_json`` on the value,
then the SAME collision-safe recursive flatten the dump reader uses —
a pipeline written against the dump replay runs unchanged against the
stream (nested payload fields get identical flattened names, envelope
collisions get identical renames).

ENVIRONMENT LIMITATION (documented): the ``spark-sql-kafka``
connector JAR and a broker are not available in this sandbox, so the
reader construction raises a clear, actionable error (with the real
versioned package coordinate) instead of Spark's bare "Failed to find
data source: kafka". The projection/flatten logic itself is exercised
in tests through a static DataFrame with the connector's output
schema, so only the connector boundary is unexercised here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: the kafka connector's fixed output schema — parse_kafka_stream
#: validates its input against this so a mis-wired relation fails
#: loudly instead of producing a half-parsed frame
CONNECTOR_COLS = (
    "key", "value", "topic", "partition", "offset", "timestamp",
)


def kafka_package() -> str:
    """The ``--packages`` coordinate for this Spark version (Spark 4
    builds against Scala 2.13) — computed so the error message below is
    copy-pasteable, never a placeholder."""
    import pyspark

    return f"org.apache.spark:spark-sql-kafka-0-10_2.13:{pyspark.__version__}"


def parse_kafka_stream(
    raw: DataFrame,
    value_schema: StructType | str,
    keep_envelope: bool = False,
) -> DataFrame:
    """Project a kafka-connector relation (streaming OR a static frame
    with the same columns) to the dump-replay contract: JSON-decode the
    binary ``value`` against ``value_schema`` and flatten it with the
    SAME collision-safe recursive rule as the batch dump reader, so
    nested payloads get identical column names on both paths.
    ``keep_envelope=True`` retains (topic, partition, offset, key,
    kafka_ts); by default the envelope is dropped, mirroring the dump
    reader's P1 projection."""
    from lakeflow.operators.flatten import flatten

    missing = [c for c in CONNECTOR_COLS if c not in raw.columns]
    if missing:
        raise ValueError(
            f"not a kafka-connector relation: missing columns {missing} "
            f"(expected {list(CONNECTOR_COLS)})"
        )
    parsed = raw.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("key").cast("string").alias("key"),
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("value"),
    )
    flat = flatten(parsed, ["value"])
    if not keep_envelope:
        flat = flat.drop(
            *[c for c in ("topic", "partition", "offset", "key", "kafka_ts")
              if c in flat.columns]
        )
    return flat


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
    contract. When the connector JAR is absent (this sandbox) the
    DATA_SOURCE_NOT_FOUND error is rewritten into an actionable message
    carrying the exact versioned --packages coordinate; every OTHER
    analysis error (bad options, etc.) propagates untouched so a real
    deployment never debugs the wrong problem. Extra ``options`` pass
    through to the reader (maxOffsetsPerTrigger, kafka.* security
    settings, ...)."""
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
        cond = getattr(e, "getCondition", lambda: "")() or ""
        if "DATA_SOURCE_NOT_FOUND" in cond or "Failed to find data source" in str(e):
            raise RuntimeError(
                "the spark-sql-kafka connector is not on the classpath — "
                f"launch with --packages {kafka_package()} (and a "
                f"reachable broker at {bootstrap_servers!r})"
            ) from e
        raise
    return parse_kafka_stream(raw, value_schema, keep_envelope)

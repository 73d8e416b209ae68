"""Kafka topic-dump import with latest-wins dedup
(`/root/reference/card_funnel/kafka_s3_to_silver.py`, SURVEY §3.2).

The reference's ``sort_values('timestamp') + drop_duplicates(keep=
'last')`` keeps the newest record per (cardApplicationId,
applicationStatus), with file order breaking exact-timestamp ties;
Spark's dropDuplicates is order-arbitrary, so the port is the window
dedup with the Kafka offset as the deterministic tiebreak (offset IS the
file order the reference implicitly relied on).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeflow.operators.dedup import latest_wins
from lakeflow.operators.flatten import flatten, sanitize_columns
from lakeflow.sources.kafka_dump import ENVELOPE_COLS
from lakeflow.sources.ndjson import read_ndjson

# kafka_s3_to_silver.py:32
EXCLUDED_STATUSES = ("INITIAL", "DEPRECATED")


def topic_table_name(df: DataFrame) -> str:
    """A1 (`kafka_s3_to_silver.py:15`): table name = most frequent topic
    with the reference's ``_topic`` suffix (it derives
    ``f'{topic.replace(".", "_")}_topic'``), deterministic tie-break."""
    row = (
        df.groupBy("topic")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("topic"))
        .first()
    )
    return row["topic"].replace(".", "_") + "_topic"


def import_topic_dump(
    spark: SparkSession,
    path: str | list[str],
    dedup_keys: Sequence[str] = ("cardApplicationId", "applicationStatus"),
    order_col: str = "timestamp",
    excluded_statuses: Sequence[str] = EXCLUDED_STATUSES,
    schema=None,
) -> tuple[str, DataFrame]:
    """Returns (derived_table_name, deduped payload DataFrame)."""
    raw = read_ndjson(spark, path, schema)
    name = topic_table_name(raw)
    # N2 flatten payload, keeping envelope for ordering (:10)
    flat = flatten(raw, ["value"])
    # D1 latest-wins dedup, offset as tiebreak (:28-30)
    deduped = latest_wins(flat, list(dedup_keys), order_col, ["offset"])
    # P5 NOT-IN status filter (:32)
    if "applicationStatus" in deduped.columns and excluded_statuses:
        deduped = deduped.filter(
            ~F.col("applicationStatus").isin(list(excluded_statuses))
        )
    # P1 drop the envelope (:16-18)
    deduped = deduped.drop(*[c for c in ENVELOPE_COLS if c in deduped.columns])
    return name, sanitize_columns(deduped)

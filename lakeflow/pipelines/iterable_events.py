"""Iterable event import (`/root/reference/card_funnel/emails_import.py`).

Null-key filter, string->int cast, ISO-with-offset parse + tz-strip,
dataFields flatten, incremental cutoff — all one lazy plan.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeflow.operators.flatten import flatten, sanitize_columns
from lakeflow.pipelines._common import require_columns
from lakeflow.sources.ndjson import read_ndjson


def import_iterable_events(
    spark: SparkSession,
    path: str | list[str],
    start: datetime | None = None,
    schema=None,
) -> DataFrame:
    df = read_ndjson(spark, path, schema)
    require_columns(df, ["userId", "createdAt"], "iterable import")
    # P7 null-key filter (emails_import.py:22-23); the reference logs the
    # dropped count — observed metrics keep that without a second pass
    df = df.filter(F.col("userId").isNotNull())
    # string->long cast (emails_import.py:24)
    df = df.withColumn("userId", F.col("userId").cast("long"))
    # F4 ISO-8601-with-offset parse, tz stripped to naive UTC wall clock
    # (emails_import.py:26: tz_localize(None) after pandas UTC convert)
    df = df.withColumn(
        "createdAt", F.to_timestamp(F.col("createdAt")).cast("timestamp_ntz")
    )
    # P8 incremental cutoff (emails_import.py:27)
    if start is not None:
        df = df.filter(F.col("createdAt") >= F.lit(start.isoformat(sep=" ")).cast("timestamp_ntz"))
    # N1 flatten dataFields (emails_import.py:44)
    if "dataFields" in df.columns:
        df = flatten(df, ["dataFields"])
    return sanitize_columns(df)

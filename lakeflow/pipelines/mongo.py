"""Mongo-export notification import
(`/root/reference/card_funnel/emails_import_mongo.py`).

Parquet with a stringified ``_doc`` JSON column; the nested
``notificationData`` is itself a JSON string whose ``notificationType``
drives the relevance filter. Reference quirks preserved: ``$`` in
flattened names (``localDateTime.$date`` — sanitized), epoch
milliseconds, dropped ``notificationPartList``. The reference's
accumulate-all-files-then-create-table dance (:58-60) is unnecessary —
the multi-file scan infers/merges the schema in one pass, and the
"first 3 files" cap (:51-52) is replaced by real incremental state
(lakeflow.sinks.ingest_state).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeflow.operators.flatten import sanitize_columns
from lakeflow.pipelines._common import require_columns
from lakeflow.sources.mongo_export import extract_json_field, read_mongo_export

# fixture-defined relevant set (reference :26-29 lists proprietary tags)
RELEVANT_TYPES = [
    "PURCHASE_CONFIRMATION",
    "PAYMENT_REMINDER",
    "AGREEMENT_TAB",
]


def import_mongo_notifications(
    spark: SparkSession,
    path: str | list[str],
    start: datetime | None = None,
    doc_schema=None,
    relevant_types: list[str] | None = None,
) -> DataFrame:
    types = relevant_types if relevant_types is not None else RELEVANT_TYPES
    # S8 scan + parse + flatten (emails_import_mongo.py:14-21)
    df = read_mongo_export(spark, path, doc_schema)
    require_columns(df, ["notificationData", "localDateTime.$date"], "mongo import")
    # N4 extract type from the nested JSON string (:18-19)
    df = extract_json_field(
        df, "notificationData", "$.notificationType", "notificationType"
    )
    # P4 relevance filter (:41, tag list :26-29)
    df = df.filter(F.col("notificationType").isin(types))
    # F4 epoch millis -> naive timestamp (:42); flattened name keeps the $
    df = df.withColumn(
        "localDateTime",
        F.timestamp_millis(F.col("`localDateTime.$date`")).cast("timestamp_ntz"),
    ).drop(F.col("`localDateTime.$date`"))
    # P8 incremental cutoff (:43)
    if start is not None:
        df = df.filter(
            F.col("localDateTime")
            >= F.lit(start.isoformat(sep=" ")).cast("timestamp_ntz")
        )
    # P2 drop expanded/noise columns (:67)
    df = df.drop("notificationPartList", "notificationData")
    # P3 sanitize incl. '$' (:55-56)
    return sanitize_columns(df)

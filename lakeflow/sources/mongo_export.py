"""Mongo-export scan (SURVEY §2.1 S8).

The reference reads Parquet whose ``_doc`` column is a stringified JSON
document, parses it, flattens, then parses the nested
``notificationData`` JSON string and extracts ``notificationType``
(`card_funnel/emails_import_mongo.py:14-21`). Here both parses are
``from_json`` inside the scan stage; the nested-field extraction is a
JSON path expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from lakeflow.operators.flatten import flatten


def read_mongo_export(
    spark: SparkSession,
    path: str | list[str],
    doc_schema: StructType | str | None = None,
    doc_col: str = "_doc",
    nested_json_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Parse+flatten the embedded document. ``nested_json_cols`` are
    flattened fields that are THEMSELVES JSON strings; each gains a
    ``<name>_type`` column via ``$.notificationType``-style extraction
    deferred to the caller — here we simply keep them as strings."""
    pq = spark.read.parquet(*path) if isinstance(path, list) else spark.read.parquet(path)
    if doc_schema is None:
        # bounded-sample inference — never a full extra scan at 100 TB;
        # pin an explicit doc_schema in production paths (SURVEY §1.3).
        from lakeflow.sources.ndjson import INFER_SAMPLE_ROWS

        sample = pq.select(doc_col).limit(INFER_SAMPLE_ROWS)
        doc_schema = spark.read.json(sample.rdd.map(lambda r: r[0])).schema
    parsed = pq.withColumn("__doc", F.from_json(F.col(doc_col), doc_schema)).drop(
        doc_col
    )
    return flatten(parsed, ["__doc"])


def extract_json_field(df: DataFrame, col: str, path: str, alias: str) -> DataFrame:
    """`get_json_object` convenience mirroring the reference's
    ``apply(lambda x: x['notificationType'])`` (N4)."""
    return df.withColumn(alias, F.get_json_object(F.col(col), path))

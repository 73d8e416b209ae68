"""Single-JSON-document import — the reference's ``s3_to_silver.py``
entry (`/root/reference/s3_to_silver.py:101-112` and the SUPER-typed
variant `s3_to_silver_prov.py:71-80`): one JSON object holding an array
of records ("colors"), exploded to rows, nested ``code`` flattened, and
``rgba`` renamed to ``code_rgba``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeflow.operators.flatten import flatten, sanitize_columns
from lakeflow.sources.ndjson import read_json_doc


def import_json_document(
    spark: SparkSession,
    path: str,
    array_field: str,
    flatten_fields: tuple[str, ...] = (),
    renames: dict[str, str] | None = None,
    schema=None,
) -> DataFrame:
    """Explode ``{array_field: [...]}`` into rows, flatten the listed
    nested fields (collision-safe), apply targeted renames, sanitize."""
    doc = read_json_doc(spark, path, schema)
    rows = doc.select(F.explode(F.col(array_field)).alias("__rec")).select(
        "__rec.*"
    )
    if flatten_fields:
        rows = flatten(rows, [f for f in flatten_fields if f in rows.columns])
    for old, new in (renames or {}).items():
        rows = rows.withColumnRenamed(old, new)
    return sanitize_columns(rows)


def import_colors(spark: SparkSession, path: str) -> DataFrame:
    """The concrete reference pipeline: colors doc -> rows with
    ``code_rgba``/``hex`` (rename at `s3_to_silver_prov.py:75`)."""
    return import_json_document(
        spark,
        path,
        array_field="colors",
        flatten_fields=("code",),
        renames={"rgba": "code_rgba"},
    )

"""JSON event-dump readers (SURVEY §2.1 S3-S5).

The reference reads S3 objects one GET at a time with hand-rolled retry
(`utils/s3_utils.py:31-78`); here every reader is a distributed Spark
scan — one task per file split, S3A retry built in, predicate/column
pruning from Catalyst. Paths may be local, ``s3a://``, glob patterns, or
Hive-partitioned directories (``.../partition=7/`` yields a partition
column and automatic pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Rows sampled for schema inference when no explicit schema is given.
#: Inference must NEVER scan the full dataset (see SURVEY §1.3: pin
#: explicit StructTypes in production paths).
INFER_SAMPLE_ROWS = 10_000


def read_ndjson(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Line-delimited JSON (S4). Explicit schema recommended in
    production; inference costs one extra pass."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).json(path)


def read_json_doc(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """One JSON document per file (S3: `utils/s3_utils.py:59-62`,
    `s3_to_silver.py:101-109`) — multiLine mode."""
    return read_ndjson(spark, path, schema, multiLine="true", **options)


def read_double_encoded_ndjson(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType | str | None = None,
    on_corrupt: str = "drop",
    corrupt_observation=None,
) -> DataFrame:
    """Double-encoded NDJSON (S5: `utils/s3_utils.py:73-78`): each line
    is a JSON *string* whose content is the event JSON —
    ``json.loads(json.loads(line))`` in the reference, here
    ``from_json ∘ from_json`` fully inside the scan stage.

    Without an explicit schema, one inference pass decodes the outer
    layer and lets the JSON source infer the inner schema (driver-side
    planning cost only; pass ``schema`` at scale).

    The outer layer is a JSON *string scalar*, which ``from_json``
    cannot target directly (struct/array/map only) — wrapping the line
    in ``[...]`` and parsing as ``array<string>`` performs the exact
    JSON string-unescape.

    Corrupt lines (not a valid JSON string): ``on_corrupt='drop'``
    silently filters them (the reference would have crashed mid-loop);
    ``'fail'`` raises at execution time with the offending line. Either
    way, pass a ``pyspark.sql.Observation`` as ``corrupt_observation``
    to count dropped lines IN the same pass (no rescan) — silent data
    loss at 100 TB must at least be a metric.
    """
    if on_corrupt not in ("drop", "fail"):
        raise ValueError(f"on_corrupt must be 'drop' or 'fail', got {on_corrupt!r}")
    raw = spark.read.text(path)
    inner = F.get(
        F.from_json(
            F.concat(F.lit("["), F.col("value"), F.lit("]")), "array<string>"
        ),
        0,
    ).alias("j")
    decoded = raw.select(inner, F.col("value").alias("__raw"))
    if corrupt_observation is not None:
        decoded = decoded.observe(
            corrupt_observation,
            F.sum(F.col("j").isNull().cast("long")).alias("corrupt_lines"),
            F.count(F.lit(1)).alias("total_lines"),
        )
    if on_corrupt == "fail":
        decoded = decoded.select(
            F.when(
                F.col("j").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("corrupt double-encoded NDJSON line: "),
                        F.col("__raw"),
                    )
                ),
            ).otherwise(F.col("j")).alias("j")
        )
    decoded = decoded.select("j").filter(F.col("j").isNotNull())
    if schema is None:
        # inference reads a BOUNDED sample, never the full dataset (an
        # unbounded .rdd inference is an extra 100 TB scan through
        # Python serialization). Fields appearing only past the sample
        # are dropped by from_json — pin an explicit schema in
        # production paths (SURVEY §1.3).
        sample = decoded.limit(INFER_SAMPLE_ROWS)
        schema = spark.read.json(sample.rdd.map(lambda r: r.j)).schema
    parsed = decoded.select(F.from_json(F.col("j"), schema).alias("rec"))
    return parsed.select("rec.*")

"""File-listing scan with pruning (SURVEY §2.1 S6).

Replaces the reference's manual key listing + regex + last_modified
cursor (`utils/s3_utils.py:81-87`) with the built-in read options:
``pathGlobFilter`` (basename pattern), ``modifiedAfter`` (mtime
watermark), ``recursiveFileLookup``. Hive-style ``partition=N`` path
segments become partition columns with automatic pruning.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_files(
    spark: SparkSession,
    path: str | list[str],
    fmt: str = "json",
    glob: str | None = None,
    modified_after: datetime | str | None = None,
    recursive: bool = False,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if modified_after is not None:
        if isinstance(modified_after, datetime):
            modified_after = modified_after.strftime("%Y-%m-%dT%H:%M:%S")
        reader = reader.option("modifiedAfter", modified_after)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if isinstance(path, str):
        path = [path]
    return reader.options(**options).load(path)

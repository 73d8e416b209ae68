"""Struct/array serialization at external boundaries (SURVEY §2.4 N5).

Silver tables keep nested data as real StructType/ArrayType/MapType
(strictly better than the reference's opaque SUPER blobs — predicates
and pruning reach into them). Serialization to JSON strings happens
only at a boundary that cannot carry nested types: a JDBC warehouse
sink, a CSV export. Mirrors the reference's ``apply(json.dumps)``
(`s3_to_silver_prov.py:47-48`, `utils/sql_utils.py:57,124-126`) as a
single typed projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType


def serialize_nested_to_json(df: DataFrame) -> DataFrame:
    """Replace every nested column with its JSON-string form (empty
    collections become null first, like the reference's N6 rule)."""
    cols = []
    for f in df.schema.fields:
        c = F.col(f"`{f.name}`")
        if isinstance(f.dataType, (ArrayType, MapType)):
            c = F.when(F.size(c) > 0, F.to_json(c)).alias(f.name)
        elif isinstance(f.dataType, StructType):
            c = F.to_json(c).alias(f.name)
        else:
            c = c.alias(f.name)
        cols.append(c)
    return df.select(*cols)

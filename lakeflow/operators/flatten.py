"""Nested-data flattening with the reference's collision-safe naming
(SURVEY §2.4 N1, §1.3).

Reference semantics (`/root/reference/utils/df_utils.py:4-14`): for each
listed nested field, flatten its children (dotted relative paths, like
pandas ``json_normalize``); a child whose name collides with an existing
column is renamed ``{field}_{child}``; the original nested column is
dropped. Column-name sanitization (`emails_import_mailgun.py:39-40`,
`emails_import_mongo.py:55`) lowercases and maps ``. - $`` (and spaces)
to ``_`` because flattening produces names like ``message.headers.to``
and ``localDateTime.$date``.

Spark's own ``select('s.*')`` errors on ambiguity instead of renaming —
this helper reimplements the reference's rule exactly, as pure column
projections (zero-cost at execution: Catalyst collapses them into the
scan's ReadSchema, so flattening nested parquet reads only the
referenced leaves).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def sanitize_name(name: str) -> str:
    """Lowercase; ``. - $`` and whitespace -> ``_``."""
    return re.sub(r"[.\-$\s]", "_", name).lower()


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Rename every column through :func:`sanitize_name` (P3)."""
    return df.toDF(*[sanitize_name(c) for c in df.columns])


def _leaf_paths(dtype: StructType, prefix: str = "") -> list[str]:
    """Dotted relative paths of all leaf (non-struct) fields."""
    out: list[str] = []
    for f in dtype.fields:
        p = f"{prefix}{f.name}"
        if isinstance(f.dataType, StructType):
            out.extend(_leaf_paths(f.dataType, f"{p}."))
        else:
            out.append(p)
    return out


def _get_path(col: Column, path: str) -> Column:
    """Navigate a dotted path with getField (names may contain - or $,
    so string column-paths are not usable)."""
    for part in path.split("."):
        col = col.getField(part)
    return col


def flatten(
    df: DataFrame, fields: Sequence[str], recursive: bool = True
) -> DataFrame:
    """Flatten the listed struct columns with collision-safe naming.

    For each field (in order): every leaf path ``p`` becomes a column
    named ``p``, unless that name is already taken — where "taken" is
    ANY current column, including the struct columns being flattened
    (exactly the reference's rule: it checks ``c in df.columns`` before
    the originals are dropped) and names produced earlier in this call —
    in which case it becomes ``{field}_{p}``. The struct columns are
    dropped at the end. Non-recursive mode stops at depth 1.
    """
    taken = list(df.columns)
    new_cols: list[Column] = [
        F.col(f"`{c}`") for c in df.columns if c not in fields
    ]
    for fld in fields:
        dtype = df.schema[fld].dataType
        if not isinstance(dtype, StructType):
            # scalar/array field listed for flattening passes through
            # under its own name (json_normalize on scalars is a no-op)
            new_cols.append(F.col(f"`{fld}`"))
            continue
        if recursive:
            paths = _leaf_paths(dtype)
        else:
            paths = [f.name for f in dtype.fields]
        for p in paths:
            name = p if p not in taken else f"{fld}_{p}"
            new_cols.append(_get_path(F.col(f"`{fld}`"), p).alias(name))
            taken.append(name)
    return df.select(*new_cols)


def flatten_all(df: DataFrame, recursive: bool = True) -> DataFrame:
    """Flatten every struct column (convenience for fully-nested event
    payloads)."""
    fields = [
        f.name for f in df.schema.fields if isinstance(f.dataType, StructType)
    ]
    return flatten(df, fields, recursive=recursive)


def empty_collections_to_null(df: DataFrame) -> DataFrame:
    """Reference N6 (`utils/sql_utils.py:56`): empty arrays/maps -> null."""
    from pyspark.sql.types import ArrayType, MapType

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (ArrayType, MapType)):
            c = F.col(f"`{f.name}`")
            cols.append(F.when(F.size(c) > 0, c).alias(f.name))
        else:
            cols.append(F.col(f"`{f.name}`"))
    return df.select(*cols)

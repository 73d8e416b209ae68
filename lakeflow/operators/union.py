"""Schema-drift-tolerant union (SURVEY §2.7 D2).

The reference accumulates per-file DataFrames with ``append`` while
event schemas drift across files (`emails_import_mongo.py:58-60`
collects everything "to know the final schema"). The Spark port is
``unionByName(allowMissingColumns=True)`` — positional ``union`` would
silently misalign drifted columns, which is the D2 semantic trap.
Multi-path reads subsume this for files; the helper exists for unioning
already-transformed frames.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def union_drifting(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union frames whose schemas may each miss columns; missing columns
    null-fill. Column order follows first occurrence."""
    if not dfs:
        raise ValueError("union_drifting: no DataFrames given")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out

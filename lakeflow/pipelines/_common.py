"""Shared pipeline helpers."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def require_columns(df: DataFrame, cols: Sequence[str], ctx: str) -> None:
    """Clear error when an input produced no parseable events.

    Schema inference on an empty/garbage input yields a column-less
    frame and the first filter would die with UNRESOLVED_COLUMN; this
    names the actual problem and the fix (an empty prefix is normal in
    incremental runs — pass an explicit ``schema`` to make it a clean
    zero-row result instead of an error).
    """
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"{ctx}: input has no parseable events with required column(s) "
            f"{missing} (columns found: {df.columns or 'none'}). If the "
            "source can legitimately be empty, pass an explicit schema= so "
            "the pipeline yields zero rows instead of failing."
        )

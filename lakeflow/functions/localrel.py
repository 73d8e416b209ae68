"""Local (driver-held) relations -> DataFrame, picking the cheap path
by size.

Two physical routes exist for turning a bounded driver-side list
(centroid tables, codebooks, threshold rows) into a DataFrame:

- a ``VALUES`` literal in SQL text: pure JVM, no Python-RDD worker
  spin-up — the fastest route for the tiny tables bench queries build
  every run, but the SQL string grows with k*dim and past a few
  thousand centroids the driver pays tens-to-hundreds of MB of text to
  parse (or OOMs in codegen);
- Arrow-backed ``createDataFrame`` over a pandas frame: constant
  per-call overhead (~100ms of session machinery), but payload moves
  as columnar batches — the only sane route at corpus-derived k.

``local_table`` switches on the total literal-cell count so callers
never have to think about it (r6 advice: the VALUES optimization is
only valid at bench scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: Above this many scalar literals the VALUES SQL string stops being
#: reasonable (~2 MB of text) and the Arrow path takes over.
MAX_LITERAL_CELLS = 200_000


def _fmt_cell(v) -> str:
    if isinstance(v, (list, tuple)):
        return f"array({', '.join(f'{int(x)}L' for x in v)})"
    return f"{int(v)}L"


def _n_cells(rows: list[tuple]) -> int:
    total = 0
    for r in rows:
        for v in r:
            total += len(v) if isinstance(v, (list, tuple)) else 1
    return total


def local_table(
    spark,
    rows: list[tuple],
    names: list[str],
    max_literal_cells: int = MAX_LITERAL_CELLS,
) -> DataFrame:
    """Bounded driver-side rows (long / array<long> cells only) as a
    DataFrame. VALUES literal below ``max_literal_cells`` total
    scalars; Arrow-backed ``createDataFrame`` above it."""
    if not rows:
        raise ValueError("local_table requires at least one row")
    if _n_cells(rows) <= max_literal_cells:
        vals = ", ".join(
            f"({', '.join(_fmt_cell(v) for v in r)})" for r in rows
        )
        return spark.sql(f"SELECT * FROM VALUES {vals} AS t({', '.join(names)})")
    import pandas as pd

    fields = [
        T.StructField(
            n,
            T.ArrayType(T.LongType())
            if isinstance(rows[0][i], (list, tuple))
            else T.LongType(),
            False,
        )
        for i, n in enumerate(names)
    ]
    pdf = pd.DataFrame(
        {
            n: [
                [int(x) for x in r[i]]
                if isinstance(r[i], (list, tuple))
                else int(r[i])
                for r in rows
            ]
            for i, n in enumerate(names)
        }
    )
    return spark.createDataFrame(pdf, schema=T.StructType(fields))

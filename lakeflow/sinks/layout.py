"""Table layout management: Z-order clustering and small-file
compaction.

At 100 TB the dominant read cost is how much of the table a query must
scan. Two layout levers:

- **Z-order (Morton) clustering**: interleave the bits of two filter
  columns and sort by the result before writing — rows close in BOTH
  dimensions land in the same files, so parquet min/max stats prune
  files for predicates on EITHER column (a plain sort only prunes the
  leading column). The key is pure integer bit arithmetic, so any
  engine reproduces it exactly.
- **Compaction**: streaming ingest and per-batch upserts accumulate
  small files; metadata overhead and task scheduling then dominate
  reads. ``compact_parquet`` rewrites to ~target-sized files via a
  single repartition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: (shift, mask) stages spreading a 16-bit value across 32 bits
_SPREAD = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))

MORTON_BITS = 16
_MORTON_MASK = (1 << MORTON_BITS) - 1


def _spread_bits(c: Column) -> Column:
    for shift, mask in _SPREAD:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def morton_key(x: Column | str, y: Column | str) -> Column:
    """32-bit Morton (Z-order) key from the low 16 bits of two long
    columns: bit i of x lands at position 2i, bit i of y at 2i+1."""
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    sx = _spread_bits(x.cast("long").bitwiseAND(F.lit(_MORTON_MASK)))
    sy = _spread_bits(y.cast("long").bitwiseAND(F.lit(_MORTON_MASK)))
    return sx.bitwiseOR(F.shiftleft(sy, 1)).alias("morton_key")


def sql_morton(x: str, y: str) -> str:
    """ANSI/DuckDB mirror of :func:`morton_key` for oracles."""

    def spread(expr: str) -> str:
        out = f"(({expr}) & {_MORTON_MASK})"
        for shift, mask in _SPREAD:
            out = f"((({out}) | (({out}) << {shift})) & {mask})"
        return out

    return f"({spread(x)} | ({spread(y)} << 1))"


def zorder_write(
    df: DataFrame, path: str, col_x: str, col_y: str, n_files: int
) -> None:
    """Write ``df`` Z-ordered on (col_x, col_y): range-partition by the
    Morton key into ``n_files`` output files, sorted within each — so
    parquet footer min/max on BOTH columns become selective and file
    pruning works for either predicate."""
    keyed = df.withColumn("__z", morton_key(col_x, col_y))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Rewrite a parquet table into ~target-sized files (small-file
    compaction after streaming/batch upsert churn). Returns the new
    file count. Size is estimated from the current on-disk footprint;
    the rewrite is a single shuffle-free coalesce when shrinking, a
    repartition when growing."""
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, (total + target_file_bytes - 1) // target_file_bytes)
    df = spark.read.parquet(path)
    compacted = df.coalesce(int(n_files)).localCheckpoint(eager=True)
    compacted.write.mode("overwrite").parquet(path)
    return int(n_files)

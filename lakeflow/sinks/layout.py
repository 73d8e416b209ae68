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


def _parquet_bytes(path: str) -> int:
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _recover_staged_swap(base: str) -> tuple[str, str]:
    """Crash recovery + staging cleanup for the two-rename swap used by
    :func:`compact_parquet` / :func:`optimize_table`.

    A prior run may have died between ``os.rename(base, old)`` and
    ``os.rename(tmp, base)`` — at that instant the only live copy of the
    table is ``._compact_old`` (and possibly a complete ``._compact_tmp``).
    Unconditionally deleting the siblings before reading ``base`` would
    destroy every remaining copy. So: if ``base`` is missing but ``old``
    exists, restore it first; if neither exists, abort loudly rather than
    proceed against a vanished table. Only then is it safe to clear
    leftover staging dirs. Returns (tmp, old) paths."""
    import os
    import shutil

    tmp, old = base + "._compact_tmp", base + "._compact_old"
    if not os.path.exists(base):
        if os.path.exists(old):
            os.rename(old, base)  # roll back the interrupted swap
        else:
            raise FileNotFoundError(
                f"compact: table path {base!r} missing and no "
                f"._compact_old sibling to restore from"
            )
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    return tmp, old


def _staged_swap(base: str, tmp: str, old: str) -> None:
    """Swap the staged rewrite in via two renames; on any failure remove
    the staging dir (never the live table). Between the two renames the
    table path briefly does not exist — readers that open the path in
    that window see a missing directory, not partial data."""
    import os
    import shutil

    try:
        os.rename(base, old)
        os.rename(tmp, base)
    except BaseException:
        if not os.path.exists(base) and os.path.exists(old):
            os.rename(old, base)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(old)


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Rewrite a parquet table into ~target-sized files (small-file
    compaction after streaming/batch upsert churn). Returns the new
    file count. Size is estimated from the current on-disk footprint;
    the rewrite is a single shuffle-free coalesce when shrinking, a
    repartition when growing.

    The compacted output is staged in a sibling ``._compact_tmp``
    directory and then swapped in with two directory renames — the live
    path is never written while it is being read, so concurrent readers
    see either the old layout or the new one, and a mid-compaction
    failure leaves the table untouched. (The previous implementation
    pinned the whole table on executor storage via ``localCheckpoint``
    to survive overwriting its own input — unacceptable for a routine
    maintenance op: not fault-tolerant, and O(table) executor memory.)
    Directory rename is atomic on POSIX/HDFS; on an object store run
    this per partition under a table format's transactional commit
    instead (see :func:`compact_partitions`). A crash between the two
    renames is recovered on the next run (``._compact_old`` is restored
    before staging dirs are cleaned).

    Reader caveat: between the two renames the path briefly does not
    exist. Tables that can take manifest-committed layout should use
    ``sinks/txtable.optimize_table`` instead — compaction there is one
    atomic manifest publish with NO reader gap (old files stay until
    vacuum)."""
    base = path.rstrip("/")
    tmp, old = _recover_staged_swap(base)
    total = _parquet_bytes(base)
    n_files = max(1, (total + target_file_bytes - 1) // target_file_bytes)
    spark.read.parquet(base).coalesce(int(n_files)).write.parquet(tmp)
    _staged_swap(base, tmp, old)
    return int(n_files)


def optimize_table(
    spark: SparkSession,
    path: str,
    col_x: str,
    col_y: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Delta ``OPTIMIZE ... ZORDER BY (x, y)`` equivalent for plain
    parquet: rewrite the table Z-ordered on (col_x, col_y) into
    ~target-sized files, staged in a sibling temp dir and swapped in
    atomically — compaction and clustering in one maintenance pass, the
    live table readable throughout. Returns the new file count."""
    base = path.rstrip("/")
    tmp, old = _recover_staged_swap(base)
    total = _parquet_bytes(base)
    n_files = int(max(1, (total + target_file_bytes - 1) // target_file_bytes))
    zorder_write(spark.read.parquet(base), tmp, col_x, col_y, n_files)
    _staged_swap(base, tmp, old)
    return n_files


def compact_partitions(
    spark: SparkSession,
    path: str,
    partitions: list[str] | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict[str, int]:
    """Partition-scoped compaction: rewrite one Hive partition directory
    (``key=value``) at a time via :func:`compact_parquet`. The working
    set is one partition, not the table — at 100 TB, table-at-once
    compaction is both a memory hazard and an availability hazard (one
    failure invalidates the whole rewrite), while per-partition swaps
    bound the blast radius to the partition in flight and let the
    maintenance job checkpoint progress between partitions. Returns
    {partition: new_file_count}."""
    import os

    base = path.rstrip("/")
    if partitions is None:
        partitions = sorted(
            d
            for d in os.listdir(base)
            if "=" in d and os.path.isdir(os.path.join(base, d))
        )
    return {
        p: compact_parquet(spark, os.path.join(base, p), target_file_bytes)
        for p in partitions
    }

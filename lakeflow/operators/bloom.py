"""Bloom-filter join pruning: pre-shuffle row elimination for
selective joins whose build side is too big to broadcast as a hash
relation but whose *membership* fits in a few megabits.

The scale problem: ``fact JOIN dim_subset`` where the subset is, say,
10M keys. Too many rows to broadcast as a hash join (a 10M-entry
broadcast relation is hundreds of MB per executor), so Spark picks a
sort-merge join and shuffles the ENTIRE fact table — at 100 TB the
shuffle of soon-to-be-dropped rows dominates the job. A Bloom filter
over the build keys is ~10 bits/key (12 MB for 10M keys at 1% fp),
cheap to ship inside the plan, and lets every fact scan task drop
non-matching rows BEFORE the shuffle. False positives only leak a few
extra rows into the exact join that follows; false negatives are
impossible, so the final result is exactly the plain join's.

This is the same trick as Spark's own runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), exposed as an
explicit operator so it works across stages Spark's optimizer can't
see through (a filter built in one job, reused by many downstream
jobs) and so the filter itself is a first-class, persistable value.

Implementation is pure codegen arithmetic — no Python in the hot path:

- **Build** (distributed, bounded collect): each key sets ``k`` bit
  positions ``pmod(xxhash64(key, seed_i), n_bits)``. Explode the k
  positions, group by 64-bit word index, ``bit_or`` the shifted bits —
  the collect is ≤ ``n_bits/64`` rows (the BITMAP size, never the key
  count: 1M-bit filter = 15,625 longs whether the dim has 10⁴ or 10⁸
  keys).
- **Probe** (narrow, whole-stage codegen): the word array rides the
  plan as an array literal; each fact row tests
  ``element_at(words, word_idx)`` & bit for all k seeds — a handful of
  JVM integer ops per row inside the scan stage, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: number of hash functions (k); with bits/key ≈ 10 this gives ~1% fp
N_SEEDS = 5


def _one_shl(bits: Column) -> Column:
    """``1L << bits`` with a Column shift amount (the pyspark wrapper
    only takes a literal int; the SQL function takes a column)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), bits.cast("int")
    )


def _bit_positions(key: Column, n_bits: int) -> list[Column]:
    """k independent bit positions for one key: xxhash64 seeded by a
    second literal column (cheap JVM hash — cross-engine parity is NOT
    needed because the filter is an engine-internal pruning aid; the
    exact join after it owns correctness)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)) for i in range(N_SEEDS)
    ]


def bloom_bits_for(n_keys: int, bits_per_key: int = 10) -> int:
    """Filter size for an expected key count, rounded up to whole
    64-bit words (≥ one word)."""
    return max(64, ((n_keys * bits_per_key + 63) // 64) * 64)


def bloom_build(dim: DataFrame, key_col: str, n_bits: int) -> list[int]:
    """Build a Bloom bitmap over ``dim[key_col]`` distributively and
    return it as a dense list of ``n_bits/64`` longs.

    The aggregation tree does all per-key work on executors (map-side
    partial ``bit_or`` combines first, so the shuffle carries at most
    ``n_bits/64`` rows per input partition); the driver only collects
    the populated words. Keys are hashed via their canonical string
    form so int/string key columns produce the same filter.
    """
    if n_bits % 64 != 0 or n_bits <= 0:
        raise ValueError(
            f"n_bits must be a positive multiple of 64 (got {n_bits}); "
            f"size with bloom_bits_for()"
        )
    key = F.col(key_col).cast("string")
    pos = F.explode(F.array(*_bit_positions(key, n_bits))).alias("bitpos")
    words = (
        dim.where(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            (F.col("bitpos") / 64).cast("long").alias("w"),
            _one_shl(F.col("bitpos") % 64).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    dense = [0] * (n_bits // 64)
    for r in words:
        dense[r["w"]] = r["bits"]
    return dense


def bloom_might_contain(
    key: Column | str, words: list[int], n_bits: int
) -> Column:
    """Codegen membership test: true iff all k bits for ``key`` are set.
    ``words`` rides the plan as an array<long> literal (the filter's
    only payload), so the test executes inside the scan's
    whole-stage-codegen — no broadcast variable, no Python."""
    if n_bits != 64 * len(words):
        raise ValueError(
            f"n_bits ({n_bits}) must equal 64 * len(words) "
            f"({64 * len(words)}): a mismatched probe silently drops "
            f"true matches (element_at past the array end is NULL)"
        )
    key = (F.col(key) if isinstance(key, str) else key).cast("string")
    arr = F.lit(words)
    cond = F.lit(True)
    for bitpos in _bit_positions(key, n_bits):
        word = F.element_at(arr, (bitpos / 64).cast("int") + F.lit(1))
        cond = cond & (word.bitwiseAND(_one_shl(bitpos % 64)) != 0)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    bits_per_key: int = 10,
    expected_keys: int | None = None,
) -> DataFrame:
    """``fact LEFT SEMI JOIN dim`` with a Bloom pre-filter on the fact
    scan. Result is EXACTLY the plain semi join (the filter admits
    false positives only; the semi join removes them), but at scale the
    shuffle input shrinks to ~selectivity × fact instead of all of it.

    ``expected_keys`` sizes the filter; when omitted, one count() of
    the (by-assumption much smaller) dim side is spent on it — at 100 TB
    pass the known cardinality or a stats estimate instead.
    """
    n_keys = expected_keys if expected_keys is not None else dim.count()
    n_bits = bloom_bits_for(int(n_keys), bits_per_key)
    words = bloom_build(dim, dim_key, n_bits)
    pruned = fact.where(bloom_might_contain(fact_key, words, n_bits))
    return pruned.join(
        dim, pruned[fact_key] == dim[dim_key], "left_semi"
    )

"""Cross-engine deterministic hashing.

Near-dup dedup (MinHash/SimHash/LSH) needs hash functions that any SQL
oracle can reproduce exactly. Engine-native hashes differ (Spark
xxhash64 vs DuckDB's hash), so we derive a 60-bit integer from md5 —
identical everywhere md5 exists, cheap enough (JVM-side, codegen'd),
and seedable by prefixing: h_i(s) = md5("{i}|" + s).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def seeded_hash(c: Column | str, seed: str | int) -> Column:
    """60-bit positive integer hash of a string column, seeded."""
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|"), c)), 1, 15), 16, 10
    ).cast("long")


# DuckDB/ANSI mirror: format with seed=<literal>, x=<sql expr>
SQL_SEEDED_HASH = "(('0x' || substr(md5('{seed}|' || ({x})), 1, 15))::BIGINT)"


def seeded_hash_py(s: str, seed: str | int) -> int:
    """Driver/Python mirror of :func:`seeded_hash` — bit-identical, for
    bounded collected samples that are processed driver-side (e.g.
    k-means init ordering in ``operators.pq.ivf_pq_fit``)."""
    import hashlib

    return int(hashlib.md5(f"{seed}|{s}".encode()).hexdigest()[:15], 16)


def hash_slices(c: Column | str, seeds: tuple[str, ...] = ("a", "b"), width: int = 7):
    """n_seeds*4 independent hashes from n_seeds md5 calls: one digest is
    32 hex chars → four disjoint ``width``-char slices. MinHash needs
    many hash functions per shingle occurrence; computing one md5 per
    function made the digest the dominant cost — slicing amortizes it 4x
    with no cross-engine divergence (substring semantics are identical).
    """
    c = F.col(c) if isinstance(c, str) else c
    out = []
    for seed in seeds:
        digest = F.md5(F.concat(F.lit(f"{seed}|"), c))
        for k in range(4):
            out.append(
                F.conv(F.substring(digest, 1 + width * k, width), 16, 10).cast("long")
            )
    return out


def sql_hash_slices(
    x: str, seeds: tuple[str, ...] = ("a", "b"), width: int = 7
) -> list[str]:
    """DuckDB mirror of :func:`hash_slices` (md5 inlined per slice; the
    oracle's engine dedups the common subexpression)."""
    return [
        f"(('0x' || substr(md5('{seed}|' || ({x})), {1 + width * k}, {width}))::BIGINT)"
        for seed in seeds
        for k in range(4)
    ]

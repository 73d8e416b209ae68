"""Corpus-level text hygiene: cross-document boilerplate detection and
eval-set decontamination.

Both operators share one shape — shingle the corpus, reduce shingles to
60-bit hashes EARLY (the shuffle then carries (id, long) rows instead of
text), and join against a derived hot/benchmark set:

- ``boilerplate_profile``: shingles occurring in many DISTINCT docs are
  templates/boilerplate ("click here to unsubscribe"); per-doc share of
  such shingles is the C4/RefinedWeb-style line-dedup signal at scan
  time. The hot set is doc-frequency-filtered, so its size is bounded by
  the boilerplate vocabulary, not the corpus.
- ``contamination_profile``: n-gram overlap of each training doc against
  a benchmark/eval corpus — the standard decontamination test. The
  benchmark shingle set is small by construction (eval sets are
  thousands of docs, not billions), so the join broadcasts; the 100 TB
  corpus never shuffles for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakeflow.functions.hashing import seeded_hash
from lakeflow.operators.text import explode_shingles

MICRO = 1_000_000


def _hashed_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int, seed: str
) -> DataFrame:
    sh = explode_shingles(df, id_col, text_col, n)
    return sh.select(F.col(id_col), seeded_hash(F.col("s"), seed).alias("h"))


def boilerplate_profile(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_doc_freq: int = 5,
) -> DataFrame:
    """Per-doc boilerplate share: fraction of the doc's shingle
    occurrences whose shingle appears in >= ``min_doc_freq`` DISTINCT
    documents. Returns (id, n_shingles, n_hot, boilerplate_micros);
    docs with fewer than ``n`` tokens are excluded.

    Two hash-aggs + one hash join, all keyed on the 60-bit shingle
    hash. The doc-frequency relation is (hash, count) — far smaller
    than the corpus — and the hot subset smaller still. The hashed
    shingle relation feeds three consumers but is deliberately NOT
    persisted: it is corpus-sized (one row per shingle occurrence),
    and re-running the codegen'd tokenize+hash scan three times
    measured cheaper than materializing it (10x corpus: 3.9 s
    recompute vs 6.2 s persisted) — the opposite trade from the
    narrow per-doc relations that similarity.py caches."""
    hs = _hashed_shingles(df, id_col, text_col, n, "bp")
    dfreq = (
        hs.distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= min_doc_freq)
        .select("h")
    )
    totals = hs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    hot_hits = (
        hs.join(dfreq, "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hot"))
    )
    return (
        totals.join(hot_hits, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.coalesce("n_hot", F.lit(0)).cast("long").alias("n_hot"),
            F.floor(
                F.coalesce("n_hot", F.lit(0))
                / F.col("n_shingles").cast("double")
                * F.lit(float(MICRO))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("boilerplate_micros"),
        )
    )


def contamination_profile(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-doc benchmark contamination: how many of the doc's DISTINCT
    n-gram shingles also occur anywhere in ``benchmark`` (same text
    column name), plus the overlap fraction in micros. Returns
    (id, n_distinct, n_overlap, contamination_micros).

    The benchmark shingle-hash set is deduplicated and broadcast —
    eval corpora are tiny next to training corpora — so the training
    scan is filter+agg only, no corpus shuffle for the join itself.
    The distinct doc-shingle relation feeds two consumers but is NOT
    persisted: it is corpus-sized, and recomputing the codegen scan
    beats materializing it (see boilerplate_profile note)."""
    doc_sh = _hashed_shingles(df, id_col, text_col, n, "ct").distinct()
    bench_sh = (
        _hashed_shingles(benchmark, id_col, text_col, n, "ct")
        .select("h")
        .distinct()
    )
    totals = doc_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_distinct"))
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.floor(
                F.coalesce("n_overlap", F.lit(0))
                / F.col("n_distinct").cast("double")
                * F.lit(float(MICRO))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("contamination_micros"),
        )
    )

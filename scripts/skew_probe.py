"""Skew-guard probe: measure the LSH / shingle skew guards on a
deliberately degenerate corpus.

Builds a skewed variant of the sf0.1 documents table — the originals
plus ``N_HOT`` near-copies of ONE boilerplate document (a template
cluster: same text except a serial number). Every copy lands in the
same LSH buckets, so uncapped banded self-joins emit ~N_HOT^2/2 pairs
from that single cluster — the degenerate shape one hot template
produces at corpus scale. The guards (``max_bucket_size`` for the
banded self-join, ``max_shingle_doc_freq`` for the shingle self-join)
drop the degenerate buckets/shingles, which is correct policy: a
1000-doc identical cluster is exact_dedup's job, not near-dup's.

Usage: python scripts/skew_probe.py [N_HOT]
Prints capped vs uncapped wall time; results recorded in SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_HOT = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
SRC = "/root/testdata/sf0.1"


def main() -> None:
    os.environ.setdefault("LAKEFLOW_MASTER", "local[32]")
    os.environ.setdefault("LAKEFLOW_SHUFFLE_PARTITIONS", "32")
    from lakeflow import get_spark
    from lakeflow.catalog import load_table
    from lakeflow.operators.similarity import near_dup_pairs, ngram_jaccard_pairs

    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, SRC, "documents").select("doc_id", "text")
    template = (
        "click here to unsubscribe from our weekly newsletter digest "
        "terms and conditions apply see website for full details ref"
    )
    hot = spark.range(N_HOT).select(
        (F.col("id") + F.lit(10_000_000)).alias("doc_id"),
        F.concat(F.lit(template + " "), F.col("id").cast("string")).alias("text"),
    )
    skewed = docs.unionByName(hot).localCheckpoint(eager=True)
    print(f"corpus: {skewed.count()} docs ({N_HOT} hot-template near-copies)")

    def timed(label: str, df_fn) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n = df_fn().count()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:44s} {best:7.2f}s  ({n} pairs)", flush=True)
        return best

    timed(
        "near_dup_pairs UNCAPPED",
        lambda: near_dup_pairs(skewed, "doc_id", "text", min_jaccard_micros=300_000),
    )
    timed(
        "near_dup_pairs max_bucket_size=32",
        lambda: near_dup_pairs(
            skewed, "doc_id", "text", min_jaccard_micros=300_000, max_bucket_size=32
        ),
    )
    timed(
        "ngram_jaccard UNCAPPED",
        lambda: ngram_jaccard_pairs(
            skewed, "doc_id", "text", min_jaccard_micros=200_000
        ),
    )
    timed(
        "ngram_jaccard max_shingle_doc_freq=64",
        lambda: ngram_jaccard_pairs(
            skewed,
            "doc_id",
            "text",
            min_jaccard_micros=200_000,
            max_shingle_doc_freq=64,
        ),
    )

    # --- BM25 hot-token stress (VERDICT r6 task #7) ------------------
    # plant one token in 90% of docs, replicate the corpus 10x, and
    # compare bm25_search wall time: the hot posting list dominates the
    # queried postings, so the 10x/1x ratio measures whether the
    # dl/totals joins and the TakeOrdered top-k stay posting-volume
    # bound (AQE splits any skewed join partition at runtime). Gate:
    # ratio <= 2x of the 10x data growth (i.e. <= 20x of the 1x time
    # would be linear-in-postings; we assert the much stronger
    # <= 2x-of-linear by comparing against the 10x no-hot baseline).
    from lakeflow.caching import scoped_cache
    from lakeflow.operators.index import bm25_search, build_inverted_index

    def with_hot(df):
        return df.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 != 0,
                F.concat(F.col("text"), F.lit(" hottoken")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )

    def replicate(df, times):
        return (
            spark.range(times)
            .crossJoin(df)
            .select(
                (F.col("doc_id") + F.col("id") * 10_000_000).alias("doc_id"),
                "text",
            )
        )

    def bm25_wall(corpus, terms) -> float:
        best = float("inf")
        for _ in range(2):
            with scoped_cache():
                t0 = time.perf_counter()
                bm25_search(build_inverted_index(corpus), terms, k=10).collect()
                best = min(best, time.perf_counter() - t0)
        return best

    base1 = docs.localCheckpoint(eager=True)
    hot10 = replicate(with_hot(docs), 10).localCheckpoint(eager=True)
    base10 = replicate(docs, 10).localCheckpoint(eager=True)
    t_1x = bm25_wall(with_hot(base1), ["hottoken", "batch"])
    t_10x_hot = bm25_wall(hot10, ["hottoken", "batch"])
    t_10x_cold = bm25_wall(base10, ["batch", "merge"])
    print(f"bm25 hot-token 1x                            {t_1x:7.2f}s")
    print(f"bm25 hot-token 10x                           {t_10x_hot:7.2f}s")
    print(f"bm25 NO-hot    10x (baseline)                {t_10x_cold:7.2f}s")
    print(
        f"bm25 hot/no-hot ratio at 10x:                {t_10x_hot / t_10x_cold:7.2f}x"
        f"   (gate <= 2x)"
    )


if __name__ == "__main__":
    main()

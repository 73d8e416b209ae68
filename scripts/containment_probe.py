"""Containment-join scale probe with a FIXED needle set (VERDICT r7
task #5): the standard replication probe multiplies every document's
TEXT verbatim, so each needle matches every copy and the measured
growth is ANSWER growth (850x flags at 10x in SCALING.md), not plan
cost. This probe isolates plan cost:

- needles = the q_containment_join needle set at sf0.1, UNCHANGED;
- haystack at Kx = copy 0 verbatim plus K-1 copies whose every token
  is namespaced per copy (``tok`` -> ``tok_cK``), so no needle shingle
  can match a perturbed copy — the true flag set at Kx is EXACTLY the
  1x flag set, and any runtime growth is the cost of scanning,
  shingling, prefix-filtering and candidate-joining 30x more haystack.

Also measures stream_contamination_guard batch-proportionality: one
guard micro-batch over the 1x corpus vs one over the Kx corpus — the
guard's per-batch cost must scale with the BATCH (per-doc cost flat),
never with anything stored.

Usage: python scripts/containment_probe.py [K]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = int(sys.argv[1]) if len(sys.argv) > 1 else 30
SRC = "/root/testdata/sf0.1"
OUT = f"/root/repo/.tmp/containment{K}"


def main() -> None:
    os.environ.setdefault("LAKEFLOW_MASTER", "local[32]")
    os.environ.setdefault("LAKEFLOW_SHUFFLE_PARTITIONS", "32")
    from pyspark.sql import functions as F

    from lakeflow import get_spark
    from lakeflow.caching import scoped_cache
    from lakeflow.catalog import load_table
    from lakeflow.operators.setsim import containment_join

    spark = get_spark("containment-probe")
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, SRC, "documents")
    needles = d.filter(F.col("doc_id") % 50 == 0)

    hay_path = os.path.join(OUT, "haystack.parquet")
    if not os.path.exists(hay_path):
        copies = []
        for k in range(K):
            c = d.select(
                (F.col("doc_id") + F.lit(k * 100_000_000)).alias("doc_id"),
                "source",
                "lang",
                "n_chars",
                (
                    F.col("text")
                    if k == 0
                    # namespace EVERY token so no original shingle survives
                    else F.array_join(
                        F.transform(
                            F.split(F.col("text"), r"\s+"),
                            lambda t: F.concat(t, F.lit(f"_c{k}")),
                        ),
                        " ",
                    )
                ).alias("text"),
            )
            copies.append(c)
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.write.mode("overwrite").parquet(hay_path)
    hay = spark.read.parquet(hay_path)
    print(f"haystack rows: 1x={d.count()} {K}x={hay.count()}", flush=True)

    def run(h):
        with scoped_cache():
            out = containment_join(needles, h, "doc_id", "text", 600_000).filter(
                F.col("needle_doc_id") != F.col("doc_doc_id")
            )
            t0 = time.perf_counter()
            n = out.count()
            return time.perf_counter() - t0, n

    # warm, then min-of-2
    run(d)
    t1, n1 = min(run(d) for _ in range(2))
    tk, nk = min(run(hay) for _ in range(2))
    print(
        f"containment_join fixed-needles: 1x {t1:.2f}s ({n1} flags), "
        f"{K}x {tk:.2f}s ({nk} flags), ratio {tk / t1:.1f} "
        f"(answer ratio {nk / max(n1, 1):.1f})",
        flush=True,
    )

    # --- stream guard batch-proportionality ---
    from lakeflow.streaming.corpus_intake import stream_contamination_guard

    schema = "doc_id long, source string, lang string, n_chars long, text string"
    for tag, rel in (("1x", d), (f"{K}x", hay)):
        nd = os.path.join(OUT, f"ndjson_{tag}")
        ck = os.path.join(OUT, f"ck_{tag}")
        fl = os.path.join(OUT, f"flags_{tag}")
        for p in (nd, ck, fl):
            shutil.rmtree(p, ignore_errors=True)
        rel.selectExpr("doc_id", "source", "lang", "n_chars", "text").coalesce(
            8
        ).write.mode("overwrite").json(nd)
        t0 = time.perf_counter()
        q = stream_contamination_guard(
            spark, nd, schema, needles, fl, ck, threshold_micros=600_000
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        n_docs = rel.count()
        print(
            f"stream_contamination_guard {tag}: {wall:.2f}s over {n_docs} "
            f"docs = {1000 * wall / n_docs:.3f} ms/doc",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Entity-resolution round-FUSION probe (r11 — VERDICT r10 task #6).

The r10 decomposition left min_label_components' residual floor at
~10 convergence rounds x ~0.4 s of local per-round stage latency
(checkpoint + join/agg + amortized probe). Candidate increment:
FUSE two propagation rounds per checkpoint+probe cycle — lineage
holds two join+agg rounds before each eager localCheckpoint, halving
the checkpoint count and keeping the every-2nd-round probe cadence,
WITHOUT pointer jumping's extra join (``sym`` is reused as-is).

Interleaved A/B on the sf0.1 linkage match graph (the
q_entity_resolution input), components-only (pairs materialized to
parquet first so blocked scoring is out of the measurement):
variant C = shipped min_label_components, variant FUSED = the
two-rounds-per-checkpoint form. 3 alternating reps each; outputs
asserted identical. Ship if >= 15% better, else record the rejection
with numbers in SCALING.md beside the pointer-jumping note.

Usage: python scripts/er_fusion_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PAIRS = "/root/repo/.tmp/er_fusion_pairs.parquet"


def fused_min_label_components(
    pairs, id_a, id_b, max_iter=25, out_id="member_id", out_label="cluster_id"
):
    """min_label_components with TWO propagation join+agg rounds per
    eager checkpoint (probe cadence unchanged: one 1-row sum per
    checkpoint). Convergence detection is on the checkpointed state,
    so a fixpoint is observed after at most one extra fused cycle."""
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                    F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
                    F.struct(F.col(id_a).alias("src"), F.col(id_a).alias("dst")),
                    F.struct(F.col(id_b).alias("src"), F.col(id_b).alias("dst")),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for i in range(0, max_iter, 2):
        mid = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("lbl").alias("lbl"))
            .withColumnRenamed("src", "id")
        )
        labels = (
            sym.join(mid, sym["dst"] == mid["id"])
            .groupBy("src")
            .agg(F.min("lbl").alias("lbl"))
            .withColumnRenamed("src", "id")
        ).localCheckpoint(eager=True)
        cur_sum = labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if cur_sum == prev_sum:
            return labels.select(
                F.col("id").alias(out_id), F.col("lbl").alias(out_label)
            )
        prev_sum = cur_sum
    raise RuntimeError(f"fused variant did not converge in {max_iter} rounds")


def main() -> None:
    from lakeflow import get_spark
    from lakeflow.operators.clusters import min_label_components

    os.environ.setdefault("LAKEFLOW_MASTER", "local[32]")
    os.environ.setdefault("LAKEFLOW_SHUFFLE_PARTITIONS", "32")
    spark = get_spark("er-fusion-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(PAIRS):
        from lakeflow.plans import llm_ops

        pairs = llm_ops._linkage_pairs(spark, SF).filter("match")
        pairs.write.mode("overwrite").parquet(PAIRS)
    pairs = spark.read.parquet(PAIRS)
    ida = [c for c in pairs.columns if c.endswith("partkey")][0]
    idb = [c for c in pairs.columns if c.endswith("cat_id")][0]
    print(f"# pairs relation: {pairs.count()} rows, ids=({ida}, {idb})")

    # warm-up (JIT + page cache), untimed
    min_label_components(pairs, ida, idb).agg(F.count(F.lit(1))).collect()

    def run(fn, tag):
        t0 = time.perf_counter()
        out = fn(pairs, ida, idb)
        n = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col("cluster_id")).alias("k"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        print(f"# {tag}: {dt:.2f}s  rows={n['n']} clusters={n['k']}")
        return dt, (n["n"], n["k"])

    results = {"C": [], "FUSED": []}
    sig = {}
    for rep in range(3):
        for tag, fn in (("C", min_label_components), ("FUSED", fused_min_label_components)):
            dt, s = run(fn, f"{tag} rep{rep + 1}")
            results[tag].append(dt)
            sig.setdefault(tag, s)
    assert sig["C"] == sig["FUSED"], f"output mismatch: {sig}"
    c, f = min(results["C"]), min(results["FUSED"])
    print(f"# min C={c:.2f}s  min FUSED={f:.2f}s  ratio={f / c:.3f}")


if __name__ == "__main__":
    main()

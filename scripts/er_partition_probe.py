"""Entity-resolution per-round exchange probe (r11 optimization round).

The shipped min_label_components (fused cycles) still pays, per
propagation round, an Exchange of `sym` into the join (sym is
checkpointed with distinct()'s (src, dst) partitioning, the join needs
hash(dst)) and an Exchange of the fresh labels (AQE coalesces the
groupBy exchange, so the checkpointed partitioning is unknown to the
next round). Candidate: pre-partition `sym` by dst (explicit
numPartitions = spark.sql.shuffle.partitions, which pins AQE away from
coalescing that exchange) before the one-time checkpoint so every
round's join reuses it, and likewise checkpoint labels with an
explicit hash(id) layout.

Variants, interleaved, outputs asserted identical:
  C2  = shipped (HEAD)
  P   = sym pre-partitioned by dst; labels checkpointed as-is
  PF3 = P + three fused rounds per checkpoint outside the tail

Usage: python scripts/er_partition_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PAIRS = "/root/repo/.tmp/er_fusion_pairs.parquet"


def _sym_labels(pairs, id_a, id_b, pre_partition: bool):
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
    if pre_partition:
        sp = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        sym = sym.repartition(sp, "dst")
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    return sym, labels


def variant(pre_partition: bool, fuse: int):
    def fn(pairs, id_a, id_b, max_iter=25):
        sym, labels = _sym_labels(pairs, id_a, id_b, pre_partition)
        prev_sum = None
        i = 0
        while i < max_iter:
            steps = 1 if i >= max_iter - 4 else fuse
            cur = labels
            for _ in range(steps):
                cur = (
                    sym.join(cur, sym["dst"] == cur["id"])
                    .groupBy("src")
                    .agg(F.min("lbl").alias("lbl"))
                    .withColumnRenamed("src", "id")
                )
            labels = cur.localCheckpoint(eager=True)
            i += steps
            cur_sum = labels.agg(
                F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
            ).collect()[0]["s"]
            if cur_sum == prev_sum:
                return labels.select(
                    F.col("id").alias("member_id"), F.col("lbl").alias("cluster_id")
                )
            prev_sum = cur_sum
        raise RuntimeError("variant did not converge")

    return fn


def main() -> None:
    from lakeflow import get_spark
    from lakeflow.operators.clusters import min_label_components

    os.environ.setdefault("LAKEFLOW_MASTER", "local[32]")
    os.environ.setdefault("LAKEFLOW_SHUFFLE_PARTITIONS", "32")
    spark = get_spark("er-partition-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(PAIRS):
        from lakeflow.plans import llm_ops

        pairs = llm_ops._linkage_pairs(spark, SF).filter("match")
        pairs.write.mode("overwrite").parquet(PAIRS)
    pairs = spark.read.parquet(PAIRS)
    ida = [c for c in pairs.columns if c.endswith("partkey")][0]
    idb = [c for c in pairs.columns if c.endswith("cat_id")][0]
    print(f"# pairs relation: {pairs.count()} rows")

    min_label_components(pairs, ida, idb).agg(F.count(F.lit(1))).collect()

    variants = {
        "C2": lambda p, a, b: min_label_components(p, a, b),
        "P": variant(True, 2),
        "PF3": variant(True, 3),
    }

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

    results: dict[str, list[float]] = {t: [] for t in variants}
    sig: dict[str, tuple] = {}
    for rep in range(3):
        for tag, fn in variants.items():
            dt, s = run(fn, f"{tag} rep{rep + 1}")
            results[tag].append(dt)
            sig.setdefault(tag, s)
    assert len(set(sig.values())) == 1, f"output mismatch: {sig}"
    for tag, ts in results.items():
        print(f"# min {tag} = {min(ts):.2f}s")


if __name__ == "__main__":
    main()

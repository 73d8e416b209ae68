"""r12 ER probe: interleaved A/B of the round-12 min_label_components
(changed-count detection folded into the propagation aggregate + the
min-over-neighbors label init that makes round 1 free) against the
r11-shipped variant (sum-equality probe, distinct-id init) — both on
the sf0.1 linkage match graph, outputs asserted identical, min-of-N
interleaved so session load cancels.

  python scripts/er_probe_r12.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("LAKEFLOW_MASTER", "local[32]")
os.environ.setdefault("LAKEFLOW_SHUFFLE_PARTITIONS", "32")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def r11_min_label_components(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    max_iter: int = 25,
    out_id: str = "member_id",
    out_label: str = "cluster_id",
) -> DataFrame:
    """The r11-shipped loop: distinct-id init, 2-round fusion, two
    equal consecutive DECIMAL(38,0) label-sum probes, 4-round
    single-step tail."""
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
    i = 0
    rounds = 0
    actions = 0
    while i < max_iter:
        steps = 1 if i >= max_iter - 4 else 2
        cur = labels
        for _ in range(steps):
            cur = (
                sym.join(cur, sym["dst"] == cur["id"])
                .groupBy("src")
                .agg(F.min("lbl").alias("lbl"))
                .withColumnRenamed("src", "id")
            )
            rounds += 1
        labels = cur.localCheckpoint(eager=True)
        i += steps
        actions += 2
        cur_sum = labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if cur_sum == prev_sum:
            print(f"#   r11 variant: {rounds} loop rounds, {actions} actions")
            return labels.select(
                F.col("id").alias(out_id), F.col("lbl").alias(out_label)
            )
        prev_sum = cur_sum
    raise RuntimeError("did not converge")


def doubling_min_label_components(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    max_iter: int = 25,
    out_id: str = "member_id",
    out_label: str = "cluster_id",
) -> DataFrame:
    """r12 candidate: min-label propagation with POINTER DOUBLING
    folded into every round — lbl'(x) = min(neighbor labels,
    label-of-label) — so the propagation radius at least doubles per
    round and a diameter-d graph converges in O(log d) rounds instead
    of d. Same fixpoint (the component min), changed-count detection
    like the r12 shipped loop."""
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
        sym.groupBy("src")
        .agg(F.min("dst").alias("lbl"))
        .withColumnRenamed("src", "id")
        .localCheckpoint(eager=True)
    )
    i = 0
    rounds = 0
    while i < max_iter:
        cur = labels
        t1 = (
            sym.join(cur, sym["dst"] == cur["id"])
            .groupBy("src")
            .agg(
                F.min("lbl").alias("lbl"),
                F.max(
                    F.when(F.col("dst") == F.col("src"), F.col("lbl"))
                ).alias("__old"),
            )
            .withColumnRenamed("src", "id")
        )
        a = cur.select(F.col("id"), F.col("lbl").alias("__l"))
        b = cur.select(F.col("id").alias("__l2"), F.col("lbl").alias("__ll"))
        t2 = a.join(b, a["__l"] == b["__l2"]).select(
            "id", F.col("__ll").alias("lbl"), F.lit(None).cast("long").alias("__old")
        )
        labels = (
            t1.unionByName(t2)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"), F.max("__old").alias("__old"))
            .select(
                "id",
                "lbl",
                (F.col("lbl") != F.col("__old")).cast("long").alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        rounds += 1
        i += 1
        n_changed = labels.agg(F.sum("__chg").alias("c")).collect()[0]["c"]
        if not n_changed:
            print(f"#   doubling variant: {rounds} rounds")
            return labels.select(
                F.col("id").alias(out_id), F.col("lbl").alias(out_label)
            )
    raise RuntimeError("did not converge")


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from lakeflow import get_spark
    from lakeflow.operators.clusters import min_label_components
    from lakeflow.plans.llm_ops import _linkage_pairs

    spark = get_spark("er-probe-r12")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    pairs = _linkage_pairs(spark, sf).filter("match").localCheckpoint(eager=True)
    print(f"# match pairs: {pairs.count()}")

    # output equality once, against the r11 variant
    a = {
        (r["member_id"], r["cluster_id"])
        for r in min_label_components(pairs, "p_partkey", "cat_id").collect()
    }
    b = {
        (r["member_id"], r["cluster_id"])
        for r in r11_min_label_components(pairs, "p_partkey", "cat_id").collect()
    }
    assert a == b, f"outputs differ: {len(a)} vs {len(b)} rows"
    c = {
        (r["member_id"], r["cluster_id"])
        for r in doubling_min_label_components(
            pairs, "p_partkey", "cat_id"
        ).collect()
    }
    assert a == c, f"doubling outputs differ: {len(a)} vs {len(c)} rows"
    print(f"# outputs identical ({len(a)} rows)")

    times: dict[str, list[float]] = {"r12": [], "r11": [], "dbl": []}
    for rep in range(n_reps):
        for tag, fn in (
            ("r12", min_label_components),
            ("r11", r11_min_label_components),
            ("dbl", doubling_min_label_components),
        ):
            t0 = time.perf_counter()
            fn(pairs, "p_partkey", "cat_id").write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            times[tag].append(dt)
            print(f"# rep{rep} {tag}: {dt:.3f}s")
    for tag, ts in times.items():
        print(f"{tag}: min {min(ts):.3f}s  all {[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()

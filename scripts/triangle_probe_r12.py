"""r12 triangle-count stage attribution: time the co-purchase pair
generation, the degree/orientation stage, and the wedge+closure stage
separately (noop-sink/persist-materialize timing), so the optimization
targets the stage that actually holds the 3.3-3.8 s.

  python scripts/triangle_probe_r12.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("LAKEFLOW_MASTER", "local[32]")
os.environ.setdefault("LAKEFLOW_SHUFFLE_PARTITIONS", "32")

from pyspark.sql import functions as F


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from lakeflow import get_spark
    from lakeflow.caching import scoped_cache
    from lakeflow.catalog import load_table
    from lakeflow.plans import QUERIES

    spark = get_spark("triangle-probe-r12")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")

    def pairs_df():
        return (
            li.alias("a")
            .join(li.alias("b"), "l_orderkey")
            .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
            .select(
                F.col("a.l_partkey").alias("pa"),
                F.col("b.l_partkey").alias("pb"),
            )
        )

    # stage sizes once
    e = (
        pairs_df()
        .select(
            F.least("pa", "pb").alias("u"), F.greatest("pa", "pb").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    n_e = e.count()
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("dd"),
    ).persist()
    n_o = oriented.count()
    a = oriented.select(
        F.col("src"), F.col("dst").alias("x"), F.col("dd").alias("dx")
    )
    b = oriented.select(
        F.col("src"), F.col("dst").alias("y"), F.col("dd").alias("dy")
    )
    wedges = a.join(b, "src").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    n_w = wedges.count()
    closed = wedges.join(
        oriented.select(F.col("src").alias("x"), F.col("dst").alias("y")),
        ["x", "y"],
        "left_semi",
    )
    n_t = closed.count()
    mx_deg = oriented.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    print(
        f"# edges={n_e} oriented={n_o} wedges={n_w} closed={n_t} "
        f"max_oriented_outdeg={mx_deg}"
    )
    e.unpersist()
    oriented.unpersist()

    fn = QUERIES["q_triangle_count"].fn
    for rep in range(n_reps):
        # full query, bench-identical region
        with scoped_cache():
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            t_full = time.perf_counter() - t0
        # stage A: pair gen + distinct (materialize via noop)
        t0 = time.perf_counter()
        pairs_df().select(
            F.least("pa", "pb").alias("u"), F.greatest("pa", "pb").alias("v")
        ).where(F.col("u") != F.col("v")).distinct().write.format("noop").mode(
            "overwrite"
        ).save()
        t_pairs = time.perf_counter() - t0
        # stage B: + degree/orientation (from a persisted e)
        e2 = (
            pairs_df()
            .select(
                F.least("pa", "pb").alias("u"),
                F.greatest("pa", "pb").alias("v"),
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
            .persist()
        )
        e2.count()
        deg2 = (
            e2.select(F.explode(F.array("u", "v")).alias("n"))
            .groupBy("n")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
        )
        du2 = deg2.select(F.col("n").alias("u"), F.col("d").alias("du"))
        dv2 = deg2.select(F.col("n").alias("v"), F.col("d").alias("dv"))
        t0 = time.perf_counter()
        orient2 = (
            e2.join(du2, "u")
            .join(dv2, "v")
            .select(
                F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
                F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
                F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("dd"),
            )
            .persist()
        )
        orient2.count()
        t_orient = time.perf_counter() - t0
        # stage C: wedges + closure from the persisted oriented relation
        a2 = orient2.select(
            F.col("src"), F.col("dst").alias("x"), F.col("dd").alias("dx")
        )
        b2 = orient2.select(
            F.col("src"), F.col("dst").alias("y"), F.col("dd").alias("dy")
        )
        t0 = time.perf_counter()
        (
            a2.join(b2, "src")
            .where(
                (F.col("dx") < F.col("dy"))
                | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
            )
            .join(
                orient2.select(
                    F.col("src").alias("x"), F.col("dst").alias("y")
                ),
                ["x", "y"],
                "left_semi",
            )
            .agg(F.count(F.lit(1)))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        t_wedge = time.perf_counter() - t0
        e2.unpersist()
        orient2.unpersist()
        print(
            f"# rep{rep}: full={t_full:.3f} pairs+distinct={t_pairs:.3f} "
            f"orient={t_orient:.3f} wedge+closure={t_wedge:.3f}"
        )


if __name__ == "__main__":
    main()

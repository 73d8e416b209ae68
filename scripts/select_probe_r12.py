"""r12 selection probe: interleaved A/B of the shortlist+certified-
local-greedy mmr_select / kcenter_select (r12) against the r11 shipped
per-round TakeOrdered(1) loops (inlined below verbatim), timed over the
bench's DRIVER_EAGER region (fn()+noop write) on the sf0.1 embeddings.
Outputs asserted identical each rep.

  python scripts/select_probe_r12.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("LAKEFLOW_MASTER", "local[32]")
os.environ.setdefault("LAKEFLOW_SHUFFLE_PARTITIONS", "32")

from pyspark.sql import functions as F


def r11_mmr_select(emb, query_pred, k=5, lam_micros=700_000,
                   id_col="vec_id", vec_col="embedding"):
    from lakeflow.caching import active_scope, maybe_persist
    from lakeflow.operators.similarity import (
        _with_vectors, cosine_micros, dot_long,
    )

    base = _with_vectors(emb, id_col, vec_col)
    qrow = (
        base.filter(
            F.col(id_col).isin(
                [r[0] for r in emb.filter(query_pred).select(F.min(id_col)).collect()]
            )
        )
        .withColumnRenamed(id_col, "__qid")
        .withColumnRenamed("__v", "__qv")
        .withColumnRenamed("__n2", "__qn2")
    )
    cand = base.join(F.broadcast(qrow), F.col(id_col) != F.col("__qid")).select(
        id_col, "__v", "__n2",
        cosine_micros(
            dot_long(F.col("__v"), F.col("__qv")), F.col("__n2"), F.col("__qn2")
        ).alias("rel_micros"),
    )
    if active_scope() is not None:
        cand = maybe_persist(cand, None)
    lam = int(lam_micros)
    picked = []
    for rank in range(1, k + 1):
        c = cand
        if picked:
            c = c.filter(~F.col(id_col).isin([p[1] for p in picked]))
            sims = [
                cosine_micros(
                    dot_long(F.col("__v"), F.array(*[F.lit(x) for x in vec])),
                    F.col("__n2"), F.lit(n2),
                )
                for (_, _, _, _, _, vec, n2) in picked
            ]
            maxsim = sims[0] if len(sims) == 1 else F.greatest(*sims)
        else:
            maxsim = F.lit(0).cast("long")
        scored = c.select(
            id_col, "__v", "__n2", "rel_micros",
            maxsim.alias("maxsim_micros"),
            (F.lit(lam) * F.col("rel_micros") - F.lit(1_000_000 - lam) * maxsim
             ).alias("score_e12"),
        )
        top = scored.orderBy(F.desc("score_e12"), F.asc(id_col)).limit(1).collect()
        if not top:
            break
        r = top[0]
        picked.append((rank, r[id_col], r["rel_micros"], r["maxsim_micros"],
                       r["score_e12"], list(r["__v"]), r["__n2"]))
    return emb.sparkSession.createDataFrame(
        [(p[0], p[1], p[2], p[3], p[4]) for p in picked],
        f"rank long, {id_col} long, rel_micros long, "
        "maxsim_micros long, score_e12 long",
    )


def r11_kcenter_select(emb, k=5, id_col="vec_id", vec_col="embedding"):
    from lakeflow.caching import active_scope, maybe_persist
    from lakeflow.operators.similarity import (
        _with_vectors, cosine_micros, dot_long,
    )

    base = _with_vectors(emb, id_col, vec_col)
    if active_scope() is not None:
        base = maybe_persist(base, None)
    picked = []
    for rank in range(1, k + 1):
        c = base
        if picked:
            c = c.filter(~F.col(id_col).isin([p[1] for p in picked]))
            sims = [
                cosine_micros(
                    dot_long(F.col("__v"), F.array(*[F.lit(x) for x in vec])),
                    F.col("__n2"), F.lit(n2),
                )
                for (_, _, _, vec, n2) in picked
            ]
            maxcos = sims[0] if len(sims) == 1 else F.greatest(*sims)
            top = (
                c.select(id_col, "__v", "__n2", maxcos.alias("maxcos_micros"))
                .orderBy(F.asc("maxcos_micros"), F.asc(id_col)).limit(1).collect()
            )
        else:
            top = (
                c.select(id_col, "__v", "__n2",
                         F.lit(0).cast("long").alias("maxcos_micros"))
                .orderBy(F.desc("__n2"), F.asc(id_col)).limit(1).collect()
            )
        if not top:
            break
        r = top[0]
        picked.append((rank, r[id_col], r["maxcos_micros"], list(r["__v"]), r["__n2"]))
    return emb.sparkSession.createDataFrame(
        [(p[0], p[1], p[2]) for p in picked],
        f"rank long, {id_col} long, maxcos_micros long",
    )


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from lakeflow import get_spark
    from lakeflow.caching import scoped_cache
    from lakeflow.catalog import load_table
    from lakeflow.operators.similarity import kcenter_select, mmr_select

    spark = get_spark("select-probe-r12")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    emb = load_table(spark, sf, "embeddings")

    variants = {
        "mmr_r12": lambda: mmr_select(emb, F.col("vec_id") == 0, k=5, lam_micros=700_000),
        "mmr_r11": lambda: r11_mmr_select(emb, F.col("vec_id") == 0, k=5, lam_micros=700_000),
        "kc_r12": lambda: kcenter_select(emb, k=5),
        "kc_r11": lambda: r11_kcenter_select(emb, k=5),
    }
    # output equality once
    o = {}
    for tag, fn in variants.items():
        with scoped_cache():
            o[tag] = sorted(tuple(r) for r in fn().collect())
    assert o["mmr_r12"] == o["mmr_r11"], f"MMR differs:\n{o['mmr_r12']}\n{o['mmr_r11']}"
    assert o["kc_r12"] == o["kc_r11"], f"kcenter differs:\n{o['kc_r12']}\n{o['kc_r11']}"
    print(f"# outputs identical: mmr {str(o['mmr_r12'])[:80]}...")

    times = {t: [] for t in variants}
    for rep in range(n_reps):
        for tag, fn in variants.items():
            with scoped_cache():
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
            times[tag].append(dt)
            print(f"# rep{rep} {tag}: {dt:.3f}s")
    for tag, ts in times.items():
        print(f"{tag}: min {min(ts):.3f}s  all {[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()

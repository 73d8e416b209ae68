"""Scale probe: replicate the sf0.1 testdata K times (consistent key
shifting, so join fan-outs and cardinalities grow realistically) and
compare per-query runtime against sf0.1. A query whose runtime grows
much faster than K signals a plan that will not survive 100 TB.

Usage: python scripts/scale_probe.py [K] [outdir] [only_query,query2,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.tmp/scale_probe"
# optional 3rd arg: comma-separated query names (default: all bench queries)
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
SRC = "/root/testdata/sf0.1"

# per-copy key offsets, consistent across tables so FK joins still match
OFFSETS = {
    "o_orderkey": 100_000_000,
    "l_orderkey": 100_000_000,
    "o_custkey": 1_000_000,
    "c_custkey": 1_000_000,
    "event_id": 100_000_000,
    "user_id": 1_000,
    "doc_id": 100_000_000,
    "vec_id": 100_000_000,
}
TABLES = [
    "region", "nation", "supplier", "part",  # dims: NOT replicated
    "customer", "orders", "lineitem", "events", "documents", "embeddings",
]
REPLICATED = {"customer", "orders", "lineitem", "events", "documents", "embeddings"}


def build(spark) -> None:
    for t in TABLES:
        dst = os.path.join(OUT, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        from lakeflow.catalog import load_table

        df = load_table(spark, SRC, t)
        if t in REPLICATED:
            copies = []
            for i in range(K):
                c = df
                for col, off in OFFSETS.items():
                    if col in c.columns:
                        c = c.withColumn(col, F.col(col) + F.lit(i * off))
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        else:
            out = df
        out.write.mode("overwrite").parquet(dst)
        print(f"built {t}", flush=True)


def main() -> None:
    os.environ.setdefault("LAKEFLOW_MASTER", "local[32]")
    os.environ.setdefault("LAKEFLOW_SHUFFLE_PARTITIONS", "32")
    from lakeflow import get_spark
    from lakeflow.plans import QUERIES
    from bench import BENCH_QUERIES

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    build(spark)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print(f"\n{'query':34s} {'sf0.1':>8s} {'sf' + str(K) + 'x':>8s} {'ratio':>6s}")
    for name in BENCH_QUERIES:
        spec = QUERIES.get(name)
        if spec is None or (ONLY is not None and name not in ONLY):
            continue
        from lakeflow.caching import scoped_cache

        from bench import DRIVER_EAGER

        eager = name in DRIVER_EAGER
        times = []
        for sf_dir in (SRC, OUT):
            runs = []
            for _ in range(2):
                # per-run ambient scope (the bench.py contract): a
                # query's internal persists are released before the
                # next run — at 30x a leaked shingle relation is GBs
                with scoped_cache():
                    # driver-eager queries (bench.DRIVER_EAGER) time
                    # fn()+write — fn() executes greedy/iterative
                    # rounds eagerly, and a write-only probe would
                    # absorb the real work into untimed code
                    # (VERDICT r9 task #3)
                    if eager:
                        t0 = time.perf_counter()
                        df = spec.fn(spark, sf_dir)
                        df.write.format("noop").mode("overwrite").save()
                        runs.append(time.perf_counter() - t0)
                    else:
                        df = spec.fn(spark, sf_dir)
                        t0 = time.perf_counter()
                        df.write.format("noop").mode("overwrite").save()
                        runs.append(time.perf_counter() - t0)
            times.append(min(runs))
        ratio = times[1] / times[0] if times[0] > 0 else float("inf")
        flag = "  <-- superlinear" if ratio > K * 1.6 else ""
        tag = " (eager)" if eager else ""
        print(
            f"{name:34s} {times[0]:8.2f} {times[1]:8.2f} {ratio:6.1f}"
            f"{tag}{flag}",
            flush=True,
        )


if __name__ == "__main__":
    main()

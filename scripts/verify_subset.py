"""Selective oracle verification: the driver-gate t2 check restricted
to a named query subset (the round's touched operators), at one or more
scale dirs. Vanilla session, same comparison as scripts/driver_gate.py.

  python scripts/verify_subset.py q_a q_b ... [--sf /root/testdata/sf0.01,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sfs = ["/root/testdata/sf0.01"]
    if "--sf" in args:
        i = args.index("--sf")
        sfs = args[i + 1].split(",")
        args = args[:i] + args[i + 2 :]
    names = args
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify-subset")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from lakeflow.testing import compare_to_oracle

    qs, osql = E.queries(), E.oracle_sql()
    fails: list[str] = []
    for sf in sfs:
        for name in names:
            if name not in qs:
                print(f"SKIP {name}: not registered")
                continue
            t0 = time.perf_counter()
            if name in osql:
                ok, msg = compare_to_oracle(qs[name](spark, sf), osql[name], sf)
                kind = "oracle"
            else:
                ok, msg = qs[name](spark, sf).count() >= 0, "rows-only"
                kind = "rows  "
            dt = time.perf_counter() - t0
            print(
                f"{'PASS' if ok else 'FAIL'} [{kind}] {name:32s} "
                f"{os.path.basename(sf):8s} {dt:5.1f}s {'' if ok else msg}"
            )
            if not ok:
                fails.append(f"{name}@{sf}")
    print(f"\n{len(fails)} failures" if fails else "\nall pass")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())

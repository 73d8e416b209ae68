"""Dump .explain('formatted') for bench queries to plans/<tag>/<query>_<suffix>.txt.

Usage: python scripts/explain_dump.py <tag> <suffix> [query ...]
  tag     e.g. r11  -> writes under plans/r11/
  suffix  'before' or 'after'
  query   optional subset; default = every BENCH_QUERIES entry

NOTE: DRIVER_EAGER queries execute their driver-side rounds during fn()
— capturing their plan runs real jobs; the dumped plan is the final
returned projection, which is why the eager rows' evidence also lives
in bench numbers, not plans alone.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

os.environ.setdefault("LAKEFLOW_MASTER", "local[32]")
os.environ.setdefault("LAKEFLOW_SHUFFLE_PARTITIONS", "32")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    from lakeflow import get_spark
    from lakeflow.caching import scoped_cache
    from lakeflow.plans import QUERIES
    import bench

    spark = get_spark("lakeflow-explain")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    if not names:
        names = [n for n in bench.BENCH_QUERIES if n in QUERIES]
    for name in names:
        spec = QUERIES[name]
        with scoped_cache():
            df = spec.fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()

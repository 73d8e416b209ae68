"""Regenerate tests/plan_snapshots.json — the plan-shape regression
baseline for EVERY registered query (the driver window and the wider
registry alike).

Run after a DELIBERATE plan change (a new operator rewrite, a join
strategy fix) and review the JSON diff like code: each changed count
is a physical-plan change at 100 TB. The gate
(tests/test_plan_snapshots.py) fails on any drift from this file.

Usage: python scripts/plan_snapshot.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "plan_snapshots.json",
)


def main() -> None:
    from lakeflow import get_spark
    from lakeflow.plans import DRIVER_WINDOW, QUERIES
    from lakeflow.plans.fingerprint import plan_fingerprint

    # the same session shape as tests/conftest.py — fingerprints are
    # config-dependent (broadcast thresholds, shuffle partitions)
    spark = get_spark("plan-snapshot", shuffle_partitions=8)
    from lakeflow.caching import scoped_cache

    snaps: dict[str, dict[str, int]] = {}
    for name in QUERIES:
        # per-query ambient scope: persists a query takes internally
        # are released before the next fingerprint, so no query's plan
        # sees another's cached relations (and each query's own
        # cached_scan count is deterministic from a cold cache)
        with scoped_cache():
            df = QUERIES[name].fn(spark, SF)
            snaps[name] = plan_fingerprint(df)
        print(f"{name}: {snaps[name]}")
    with open(OUT, "w") as fh:
        json.dump(snaps, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"\nwrote {len(snaps)} fingerprints to {OUT}")


if __name__ == "__main__":
    main()

"""Plan-shape regression gate (VERDICT r5 task #9, widened in round 6
from the driver window to ALL registered queries): every query's
physical plan is fingerprinted (counts of shuffles, broadcasts,
Python-eval boundaries, join strategies, windows, sorts, explodes,
top-k) and compared against the checked-in snapshot. ANY drift fails —
a silent extra Exchange, a broadcast degrading to a sort-merge join, or
a builtin expression falling back to Python must arrive as a reviewed
snapshot change (``python scripts/plan_snapshot.py``), never as an
accident riding in on an unrelated edit.

The per-marker plan gates in test_plans.py assert specific REQUIRED
properties; this gate freezes the whole shape so regressions in
anything not individually asserted still surface.
"""

from __future__ import annotations

import json
import os

import pytest

from lakeflow.plans import QUERIES
from lakeflow.plans.fingerprint import plan_fingerprint

SF = "/root/testdata/sf0.001"
SNAP_PATH = os.path.join(os.path.dirname(__file__), "plan_snapshots.json")


@pytest.fixture(scope="module", autouse=True)
def _cold_cache(spark):
    # fingerprints are COLD-CACHE plans: earlier test modules that run
    # registry queries without an ambient scope (oracle parity) leave
    # session-lifetime persisted relations, and any lineage match would
    # surface as InMemoryTableScan here — a session artifact, not a
    # plan regression. One blanket clear before the module restores the
    # snapshot baseline; per-query scoped_cache below keeps the module
    # itself leak-free.
    spark.catalog.clearCache()

with open(SNAP_PATH) as _fh:
    SNAPSHOTS: dict[str, dict[str, int]] = json.load(_fh)


def test_snapshot_covers_the_window():
    missing = [n for n in QUERIES if n not in SNAPSHOTS]
    assert not missing, (
        f"no plan snapshot for {missing}; run scripts/plan_snapshot.py "
        "and review the diff"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_shape_unchanged(spark, name):
    if name not in SNAPSHOTS:
        pytest.skip("covered by test_snapshot_covers_the_window")
    from lakeflow.caching import scoped_cache

    # per-query ambient scope, mirroring scripts/plan_snapshot.py: a
    # query's internal persists must not leak InMemoryTableScans into
    # the next query's fingerprint
    with scoped_cache():
        got = plan_fingerprint(QUERIES[name].fn(spark, SF))
    want = SNAPSHOTS[name]
    assert got == want, (
        f"{name}: physical-plan shape drifted.\n"
        f"  snapshot: {want}\n"
        f"  current : {got}\n"
        "If this change is deliberate, regenerate with "
        "`python scripts/plan_snapshot.py` and review the JSON diff."
    )

"""Physical-plan shape fingerprints — the plan-diff regression gate.

``plan_fingerprint`` reduces a formatted physical plan to the counts
of the node types that decide scale behavior: shuffles, broadcasts,
Python-eval boundaries, joins by strategy, windows, sorts, explodes,
driver-merged top-k. Per-query fingerprints for every DRIVER_WINDOW
query are snapshotted in ``tests/plan_snapshots.json``; the test gate
(``tests/test_plan_snapshots.py``) recomputes them and fails on ANY
drift — a silent extra Exchange or a builtin expression falling back
to Python must be a deliberate, reviewed change (regenerate with
``python scripts/plan_snapshot.py``), never an accident riding in on
an unrelated edit.

Counts come from the formatted explain's node list (``NodeName (id)``),
which is the deterministic pre-AQE static plan: stable for a fixed
input scale + session config, independent of runtime statistics.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

#: node-name -> fingerprint key; every occurrence of ``Name (n)`` in a
#: formatted plan counts once. Keys with value 0 are omitted from the
#: fingerprint so snapshots stay readable.
_NODES: dict[str, str] = {
    "Scan": "scan",
    "InMemoryTableScan": "cached_scan",
    "Exchange": "shuffle_exchange",
    "BroadcastExchange": "broadcast_exchange",
    "ReusedExchange": "reused_exchange",
    "BroadcastHashJoin": "broadcast_hash_join",
    "SortMergeJoin": "sort_merge_join",
    "ShuffledHashJoin": "shuffled_hash_join",
    "BroadcastNestedLoopJoin": "nested_loop_join",
    "CartesianProduct": "cartesian",
    "HashAggregate": "hash_aggregate",
    "ObjectHashAggregate": "object_hash_aggregate",
    "SortAggregate": "sort_aggregate",
    "Window": "window",
    "WindowGroupLimit": "window_group_limit",
    "Sort": "sort",
    "TakeOrderedAndProject": "take_ordered",
    "Generate": "generate",
    "ArrowEvalPython": "python_eval",
    "BatchEvalPython": "python_eval",
    "MapInPandas": "python_eval",
    "FlatMapGroupsInPandas": "python_eval",
    "FlatMapGroupsInPandasWithState": "python_eval",
    "PythonMapInArrow": "python_eval",
    "MapInArrow": "python_eval",
}

# detail-section entries: one "(id) NodeName" line per physical node
# (the tree section appends join-type/build-side modifiers before the
# id — "SortMergeJoin FullOuter (15)" — so it is NOT parseable by node
# name; the detail section is)
_NODE_RE = re.compile(r"^\((\d+)\) ([A-Za-z]+)", re.MULTILINE)


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_fingerprint(df: DataFrame) -> dict[str, int]:
    """Count scale-relevant node types in ``df``'s formatted physical
    plan. Parses the detail section, which lists every physical node
    (main plan AND subqueries) exactly once as ``(id) NodeName``."""
    plan = formatted_plan(df)
    out: dict[str, int] = {}
    for m in _NODE_RE.finditer(plan):
        key = _NODES.get(m.group(2))
        if key is None:
            continue
        out[key] = out.get(key, 0) + 1
    return out

"""Differential test of every registered query against its DuckDB
oracle — the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import os

import pytest

from lakeflow.plans import QUERIES
from lakeflow.testing import compare_to_oracle

SF_DIR = os.environ.get("LAKEFLOW_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    from lakeflow.plans import DRIVER_WINDOW

    spec = QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    if name in DRIVER_WINDOW:
        # VERDICT r7 task #1 (class closure): the driver's pandas
        # canonicalizer sort_values over raw cells cannot hash
        # list/dict values (CORRECTNESS_r06 q_tokenize_ids,
        # CORRECTNESS_r07 q_empty_to_null both errred on exactly
        # this), so no windowed query may emit nested output columns.
        # Serialize (to_json / array_join) or explode, and keep the
        # native-shape form as a NEVER_WINDOWED_TWINS local twin.
        from pyspark.sql.types import ArrayType, MapType, StructType

        nested = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        assert nested == [], (
            f"{name} is in DRIVER_WINDOW but outputs nested columns "
            f"{nested}; the driver canonicalizer cannot hash them — "
            "serialize to a flat form and keep the nested shape as a "
            "NEVER_WINDOWED_TWINS local twin"
        )
    if spec.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert df.count() >= 0
        return
    ok, msg = compare_to_oracle(df, spec.oracle, SF_DIR)
    assert ok, f"{name}: {msg}"


def test_registry_invariants():
    from lakeflow.plans import DRIVER_WINDOW

    # the driver records exactly the first 50 registry entries: the
    # curated window must stay exactly 50, all present, ordered first
    assert len(DRIVER_WINDOW) == 50
    assert list(QUERIES)[:50] == list(DRIVER_WINDOW)
    # every query ships an executable oracle (contract queries assert
    # their pass boolean; nothing falls back to the weaker rows-only
    # driver check without a deliberate decision here)
    missing = [n for n, s in QUERIES.items() if s.oracle is None]
    assert missing == [], f"queries without oracles: {missing}"
    # descriptions are the judge-facing operator inventory
    undocumented = [n for n, s in QUERIES.items() if not s.description]
    assert undocumented == [], undocumented


#: Registered local-only twins of a windowed query: same operator,
#: alternate output representation kept for the local gate. These are
#: the ONLY queries allowed to be neither windowed nor driver-certified
#: (their windowed sibling carries the certification).
NEVER_WINDOWED_TWINS = {
    "q_tokenize_ids_arrays": "q_tokenize_ids",  # native array<long> form
    "q_empty_to_null_arrays": "q_empty_to_null",  # native array<string> form
}


def test_every_query_windowed_or_certified():
    # VERDICT r6 task #10: the rotation ledger is machine-checkable.
    # CERTIFIED.json (scripts/certified_ledger.py, rebuilt from the
    # driver's CORRECTNESS_r*.json each round) records each query's
    # first green driver row; every registered query must either be in
    # the CURRENT window (certification lands this round) or already
    # hold a recorded round — so rotation can never silently orphan a
    # query. Twins in NEVER_WINDOWED_TWINS must name a sibling that
    # itself satisfies the rule.
    import json

    from lakeflow.plans import DRIVER_WINDOW

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "CERTIFIED.json")) as fh:
        certified = json.load(fh)
    orphans = [
        n
        for n in QUERIES
        if n not in DRIVER_WINDOW
        and n not in certified
        and n not in NEVER_WINDOWED_TWINS
    ]
    assert orphans == [], (
        f"queries neither windowed nor driver-certified: {orphans}; "
        "rotate them into DRIVER_WINDOW or regenerate CERTIFIED.json"
    )
    for twin, sibling in NEVER_WINDOWED_TWINS.items():
        assert twin in QUERIES
        assert sibling in DRIVER_WINDOW or sibling in certified


def test_docs_counts_match_registry():
    # README/COVERAGE quote the registry and window sizes; derive them
    # from the code here so the docs cannot rot when queries are added
    from lakeflow.plans import DRIVER_WINDOW

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readme = open(os.path.join(root, "README.md")).read()
    coverage = open(os.path.join(root, "COVERAGE.md")).read()
    n, w = len(QUERIES), len(DRIVER_WINDOW)
    assert f"{n} named queries" in readme, f"README must say '{n} named queries'"
    assert f"{n}/{n}" in readme, f"README must quote the {n}/{n} local gate"
    assert f"FIRST {w} registry entries" in readme
    assert f"Registry\n  total: {n} queries" in coverage or f"Registry total: {n} queries" in coverage.replace(
        "\n  ", " "
    ), f"COVERAGE must quote 'Registry total: {n} queries'"
    assert f"{n}/{n}" in coverage


@pytest.mark.parametrize(
    "name",
    [
        "q_salted_agg",
        "q_minhash_lsh_pairs",
        "q_hash_sample",
        "q_kmeans_cells",
        "q_exact_k_sample",
        # exercises the decimal->double single-division idiom: scores
        # must not depend on partial-agg grouping or partition count
        "q_bm25_search",
    ],
)
def test_partitioning_invariance(spark, name):
    # results must be a function of the DATA, not the parallelism: the
    # same query under different shuffle widths returns identical rows
    # (catches raw rand()/monotonically_increasing_id-style leaks)
    spec = QUERIES[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, spec.fn(spark, SF_DIR).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = sorted(map(tuple, spec.fn(spark, SF_DIR).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b

"""Physical-plan quality gates (SURVEY §4): these assert the plans we
WANT at 100 TB, not just correct answers — broadcast joins for small
dimensions, filter/column pushdown into the parquet scan, no cartesian
products anywhere in the declared surface, whole-stage codegen on the
hot relational paths."""

from __future__ import annotations

import contextlib
import io

import pytest

from lakeflow.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q3_broadcasts_customer_dimension(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan


def test_q5_broadcasts_dimension_chain(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_column_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # ReadSchema lists only referenced columns — l_orderkey/l_partkey etc
    # must NOT be read for a 7-column aggregate
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_partkey" not in read_schema and "l_comment" not in read_schema
    assert "l_quantity" in read_schema


def test_semi_anti_join_operators(spark):
    assert "LeftSemi" in _plan(spark, "q_semi_join_customers")
    assert "LeftAnti" in _plan(spark, "q_anti_join_customers")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_products(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_whole_stage_codegen_on_hot_paths(spark):
    # codegen stage markers (*(n)) only appear in simple-mode explain
    # with AQE's deferred planning out of the way
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ("q1_pricing_summary", "q_text_stats", "q_json_extract_events"):
            df = QUERIES[name].fn(spark, SF)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain()
            assert "*(" in buf.getvalue(), name
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_multimodal_meta_is_pure_jvm(spark):
    # md5 + octet_length over binary payloads are built-ins: 100 TB of
    # media must never cross the Arrow boundary just to be sized/hashed
    plan = _plan(spark, "q_multimodal_meta")
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "FlatMapsInPandas"):
        assert marker not in plan, f"q_multimodal_meta plans {marker}"


def test_hash_sample_is_narrow_scan_filter(spark):
    # deterministic sampling must be a pure codegen'd filter at the
    # scan: a sample that shuffles 100 TB defeats its own purpose
    plan = _plan(spark, "q_hash_sample")
    assert "Exchange" not in plan, plan


def test_contamination_broadcasts_benchmark_set(spark):
    # the eval-corpus shingle set is tiny by construction; the training
    # corpus must never shuffle for the overlap join
    plan = _plan(spark, "q_contamination")
    assert "BroadcastHashJoin" in plan


def test_range_join_is_equi_not_nested_loop(spark):
    # the bucketed range self-join must plan as a hash/sort-merge join on
    # (key, bucket), never BroadcastNestedLoopJoin over the inequality
    plan = _plan(spark, "q_range_pairs_events")
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_exchange_reuse_at_runtime(spark):
    # both self-join sides are the same signature pipeline; the planner
    # must reuse one exchange, not run the expensive shingle+hash scan
    # twice (visible statically with AQE's deferred planning disabled)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QUERIES["q_minhash_lsh_pairs"].fn(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        assert "ReusedExchange" in buf.getvalue()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

def test_kmeans_assignment_is_narrow_map(spark):
    # the predict pass folds centroids into the plan as literals: a
    # final assignment that shuffles (or joins) the corpus would pay
    # an avoidable full-data exchange per scoring run at 100 TB
    plan = _plan(spark, "q_kmeans_cells")
    assert "Exchange" not in plan, plan
    for marker in ("ArrowEvalPython", "BatchEvalPython"):
        assert marker not in plan, f"q_kmeans_cells plans {marker}"


def test_heavy_hitters_partial_aggregates(spark):
    # hot tokens must be pre-reduced map-side: the shuffle carries
    # (partition, token) partials, never raw token occurrences
    plan = _plan(spark, "q_heavy_hitters")
    assert "partial_count" in plan, plan


def _window_feeds_from_take_ordered(plan: str) -> bool:
    """True iff every Window node in a formatted plan sits downstream of a
    TakeOrderedAndProject / GlobalLimit — i.e. the single-partition window
    only ever sees the k-row top-k result, never the full relation."""
    lines = plan.splitlines()
    win_ids = [
        int(ln.split("(")[1].split(")")[0])
        for ln in lines
        if ln.strip().startswith("Window (")
    ]
    lim_ids = [
        int(ln.split("(")[1].split(")")[0])
        for ln in lines
        if "TakeOrderedAndProject (" in ln or "GlobalLimit (" in ln
    ]
    # formatted-plan node ids increase from scan towards the result, so a
    # limit with a smaller id than the window executes before it
    return bool(lim_ids) and all(
        any(lid < wid for lid in lim_ids) for wid in win_ids
    )


def test_heavy_hitters_topk_is_take_ordered(spark):
    # the global top-k must be per-partition heaps (TakeOrderedAndProject)
    # merged at the driver — never row_number over an unpartitioned window
    # that funnels the whole distinct-token relation into one task
    plan = _plan(spark, "q_heavy_hitters")
    assert "TakeOrderedAndProject" in plan or "GlobalLimit" in plan, plan
    assert _window_feeds_from_take_ordered(plan), plan


def test_collocations_topk_is_take_ordered(spark):
    # same contract for the scored-bigram relation
    plan = _plan(spark, "q_collocations")
    assert "TakeOrderedAndProject" in plan or "GlobalLimit" in plan, plan
    assert _window_feeds_from_take_ordered(plan), plan


def test_exact_k_sample_is_take_ordered(spark):
    # exactly-k sampling must be per-partition heaps, never a global sort
    plan = _plan(spark, "q_exact_k_sample")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan or "GlobalLimit" not in plan


def test_clean_lines_is_narrow_projection(spark):
    # line cleaning is higher-order array functions in one projection:
    # no shuffle, no explode-driven row blowup, no Python
    plan = _plan(spark, "q_clean_lines")
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan  # no explode
    for marker in ("ArrowEvalPython", "BatchEvalPython"):
        assert marker not in plan, plan


def test_q20_nested_semi_joins(spark):
    # both IN-subqueries must plan as semi joins (part list into the
    # lineitem scan side, qualified suppliers into the dim)
    plan = _plan(spark, "q20_potential_promotion")
    assert plan.count("LeftSemi") >= 2, plan
    assert "CartesianProduct" not in plan


def test_q2_min_cost_is_decorrelated_aggregate(spark):
    # the per-part MIN "correlated subquery" must run as one aggregate
    # joined back — a single pass over the supply relation — and the
    # final top-100 as TakeOrderedAndProject
    plan = _plan(spark, "q2_min_cost_supplier")
    assert "TakeOrderedAndProject" in plan, plan


def test_q21_uses_semi_and_anti_joins(spark):
    # the exists/not-exists composition must plan as LeftSemi+LeftAnti
    # equi-joins on orderkey — a correlated-subquery fallback would
    # re-scan lineitem per order
    plan = _plan(spark, "q21_waiting_suppliers")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_q15_broadcasts_the_global_max(spark):
    # the scalar-max gate must arrive as a broadcast, not a sort
    plan = _plan(spark, "q15_top_supplier")
    assert "BroadcastExchange" in plan, plan
    assert "GlobalLimit" not in plan and "Sort [total_rev" not in plan, plan


def test_gold_funnel_broadcasts_customer_dim(spark):
    plan = _plan(spark, "q_gold_funnel_join")
    assert "BroadcastHashJoin" in plan, plan


def test_percent_rank_cdf_joins_broadcast(spark):
    # the distinct-value CDF relation is tiny (bounded by the value
    # domain) — it must broadcast into the corpus join, never shuffle
    # the corpus by value
    plan = _plan(spark, "q_percent_rank")
    assert "BroadcastHashJoin" in plan, plan


def test_repeated_spans_single_count_aggregate(spark):
    # the dup-gram mark must be a left-semi against ONE count aggregate
    plan = _plan(spark, "q_repeated_spans")
    assert "LeftSemi" in plan, plan


def test_bpe_merges_is_take_ordered(spark):
    # the top-20 merge candidates must be per-partition heaps merged at
    # the driver, never a global sort of the pair-count relation
    plan = _plan(spark, "q_bpe_merges")
    assert "TakeOrderedAndProject" in plan, plan


def test_setsim_join_no_cartesian_no_nested_loop(spark):
    # candidate generation must stay an equi-join on prefix elements;
    # the only acceptable join strategies are hash/sort-merge
    plan = _plan(spark, "q_setsim_join")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_pps_sample_windows_are_bucketed(spark):
    # at scale (n_buckets explicit or source > SINGLE_TASK_BYTES) the
    # cumulative weight must ride the distributed prefix sum: every
    # window sort key list that orders the full relation must be
    # partitioned by the bucket column, and the only unbucketed window
    # is the per-bucket offsets pass (input <= n_buckets rows)
    import contextlib
    import io

    from lakeflow.catalog import load_table
    from lakeflow.operators.sampling import pps_systematic_sample

    d = load_table(spark, SF, "documents")
    df = pps_systematic_sample(d, "doc_id", "n_chars", 50, n_buckets=32)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, plan
    # the bucket column must survive into the window stage — formatted
    # plans spell window specs as windowspecdefinition(...); the
    # within-bucket running sum partitions on (__g, __b)
    assert "windowspecdefinition" in plan, plan
    assert "__b" in plan, plan
    assert plan.count("Window") >= 2, plan


def test_pps_sample_auto_plan_at_small_scale(spark):
    # n_buckets=None on a tiny parquet source picks the plain window
    # (auto_buckets metadata switch): one partitionBy(__g) window, no
    # bucket machinery overhead — results bit-identical (test_topk)
    plan = _plan(spark, "q_pps_sample")
    assert "CartesianProduct" not in plan, plan
    assert "windowspecdefinition" in plan, plan
    assert "__b" not in plan, plan  # no bucket column below threshold

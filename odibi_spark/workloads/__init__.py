"""Declared query workloads: every entry pairs a Spark implementation
(built on the odibi_spark operator library) with a DuckDB oracle SQL
string, forming the driver's correctness gate (CORRECTNESS_r{N}.json).

Conventions for hash-stable oracle parity (SURVEY §7.3 dialect notes):
- SUM over doubles goes through DECIMAL(18,4) (exact, order-independent)
  and is cast back to DOUBLE; averages divide that exact sum by the
  count in double — both engines then produce bit-identical values.
- Every computed column is aliased identically on both sides.
- LIMIT/top-k queries always order by a unique tiebreak.
- Session timezone is pinned to UTC inside each query.
"""

from odibi_spark.workloads.core import ORACLES as _CORE_ORACLES
from odibi_spark.workloads.core import QUERIES as _CORE_QUERIES
from odibi_spark.workloads.extras import ORACLES as _EXTRA_ORACLES
from odibi_spark.workloads.extras import QUERIES as _EXTRA_QUERIES
from odibi_spark.workloads.llmdata import ORACLES as _LLM_ORACLES
from odibi_spark.workloads.llmdata import QUERIES as _LLM_QUERIES
from odibi_spark.workloads.tpch import ORACLES as _TPCH_ORACLES
from odibi_spark.workloads.tpch import QUERIES as _TPCH_QUERIES
from odibi_spark.workloads.tpch2 import ORACLES as _TPCH2_ORACLES
from odibi_spark.workloads.tpch2 import QUERIES as _TPCH2_QUERIES
from odibi_spark.workloads.tpch3 import ORACLES as _TPCH3_ORACLES
from odibi_spark.workloads.tpch3 import QUERIES as _TPCH3_QUERIES

_ALL_QUERIES = {
    **_CORE_QUERIES, **_LLM_QUERIES, **_EXTRA_QUERIES,
    **_TPCH_QUERIES, **_TPCH2_QUERIES, **_TPCH3_QUERIES,
}
_ALL_ORACLES = {
    **_CORE_ORACLES, **_LLM_ORACLES, **_EXTRA_ORACLES,
    **_TPCH_ORACLES, **_TPCH2_ORACLES, **_TPCH3_ORACLES,
}

# Dict order is sampling priority: the driver's correctness gate checks
# the FIRST 50 entries. The sample ROTATES each round so every declared
# workload gets a driver-side hash check within two rounds (VERDICT r4
# task 2). Round 8 executes the queue staged in r7 (VERDICT r7 task 1):
# the 27 remaining r5-checked entries plus the 3 entries displaced from
# the r7 head, then this round's brand-new workloads, then the oldest
# r6-checked entries (in their r6 head order) to fill the head to 50.
_R8_ROTATE_IN = [
    "convert_event_values", "unpivot_flag_metrics",
    "window_price_change", "token_counts_by_source",
    "fingerprint_by_source", "lang_stopword_profile",
    "language_guesses", "approx_percentiles_by_source",
    "dedup_incremental_docs", "q2_min_cost_supplier",
    "q11_important_parts", "q12_ship_latency", "q16_supplier_variety",
    "q20_excess_share_suppliers", "q21_waiting_suppliers",
    "mixture_weighted_sample", "schema_polish_customers",
    "convert_timezone_orders", "validate_orders_quality",
    "star_fact_orders", "delete_detection_customers",
    "incremental_agg_orders", "streaming_click_attribution",
    "resample_user_events", "funnel_view_click_purchase",
    "cohort_daily_retention", "outlier_events_zscore",
    # displaced from the r7 head when the late-r7 workloads landed
    "distinct_segment_nation", "lookup_nation_names",
    "date_dimension_calendar",
]

# Workloads declared for the first time in round 8 — never driver-
# checked, so they go right after the rotated-in block.
_R8_NEW = [
    "merge_upsert_customers", "pipeline_health_runs",
    "sla_status_pipelines", "multimodal_video_features",
    "semantic_dedup_embeddings", "neardup_decontamination_hits",
    "dsir_sample_docs", "quantized_embedding_fidelity",
]

# Oldest r6-checked entries (in their r6 head order) — fill the head
# to 50. The rest of the r6-checked set is staged in _R9_ROTATE_IN.
_R6_CHECKED_REFRESH = [
    "ewma_user_values", "outlier_events_mad", "fuzzy_match_parts",
    "spatial_customers_near_suppliers", "snapshot_cdc_customers",
    "decile_customer_spend", "split_documents_sets",
    "resample_interp_user_events", "conversion_latency_quartiles",
    "transition_matrix_events", "zorder_key_orders", "pps_sample_docs",
    "psychrometrics_events", "heavy_hitter_terms",
    "streaming_ewma_user_values", "streaming_shards_docs",
]

# ROUND-9 ROTATION QUEUE: the r6-checked entries that did not fit this
# round's head — after r8 they are the oldest-checked set. Next round,
# move these into the first-50 head (plus any r9-new workloads),
# demoting the r8-checked entries; fill any remaining head slots from
# the r7-checked set in its r7 head order.
_R9_ROTATE_IN = [
    "sample_k_docs_per_lang",  # bumped from the r8 fill by the late-r8 video workload
    # bumped from the r8 fill by the four late-r8 curation workloads
    "psychrometrics_events", "heavy_hitter_terms",
    "streaming_ewma_user_values", "streaming_shards_docs",
    "cast_trim_clean_parts", "decontamination_bloom_hits",
    "q1_pricing_summary", "q3_top_orders", "q5_revenue_by_nation",
    "q10_returned_revenue", "sessionize_events", "cube_flag_status",
    "except_lapsed_customers", "rollup_orders_year_priority",
    "window_range_frame_spend", "text_quality", "exact_dedup_docs",
    "ngram_jaccard_docs", "embedding_cosine_topk", "minhash_lsh_pairs",
    "simhash_near_docs", "lsh_ann_neighbors", "embedding_neardup_pairs",
    "repetition_signals_docs", "decontamination_hits",
    "token_budget_by_source", "stratified_sample_langs",
    "chunk_documents_docs", "pack_sequences_docs", "scrub_pii_docs",
    "neardup_clusters", "percentiles_by_source", "tfidf_top_terms",
    "semantic_revenue_by_segment", "streaming_hourly_events",
    "multimodal_image_features", "asof_click_purchase",
]

_unknown_rotate = (
    set(_R8_ROTATE_IN) | set(_R8_NEW) | set(_R6_CHECKED_REFRESH)
    | set(_R9_ROTATE_IN)
) - set(_ALL_QUERIES)
if _unknown_rotate:  # fail loudly: a stale queue would silently shrink
    raise RuntimeError(  # the next round's driver-checked head
        f"rotation queue names unknown workloads: {sorted(_unknown_rotate)}"
    )

_HEAD = [
    k for k in _R8_ROTATE_IN + _R8_NEW + _R6_CHECKED_REFRESH
    if k in _ALL_QUERIES
][:50]
_ORDER = _HEAD + [k for k in _ALL_QUERIES if k not in set(_HEAD)]
QUERIES = {k: _ALL_QUERIES[k] for k in _ORDER}
ORACLES = {k: _ALL_ORACLES[k] for k in _ORDER if k in _ALL_ORACLES}

__all__ = ["QUERIES", "ORACLES"]

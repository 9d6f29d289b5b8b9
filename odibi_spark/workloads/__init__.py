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
# task 2). Round 6 executes the staged rotation (VERDICT r5 task 2):
# the 14 queued late-r5 workloads move to the head (their FIRST driver
# hash check — decile_customer_spend now runs the new distributed
# two-pass rank), followed by the workloads new this round, then the
# r4-checked distinctive set (longest since last driver check). The
# r5-driver-verified basics + r5-new entries demote to the tail under
# the committed ORACLE_r06.log + pytest.
_R6_ROTATE_IN = [
    "ewma_user_values", "outlier_events_mad", "fuzzy_match_parts",
    "spatial_customers_near_suppliers", "snapshot_cdc_customers",
    "decile_customer_spend", "split_documents_sets",
    "resample_interp_user_events", "conversion_latency_quartiles",
    "transition_matrix_events", "zorder_key_orders", "pps_sample_docs",
    "psychrometrics_events", "heavy_hitter_terms",
]

# Workloads declared for the first time in round 6 — never driver-
# checked, so they go right after the rotated-in block.
_R6_NEW = [
    "streaming_ewma_user_values", "streaming_shards_docs",
    "sample_k_docs_per_lang", "cast_trim_clean_parts",
    "decontamination_bloom_hits",
]

# r4-driver-checked distinctive set, longest since last driver check —
# fills the head to 50.
_R4_CHECKED_REFRESH = [
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

# ROUND-7 ROTATION QUEUE: entries whose last driver-side hash check is
# oldest after this round (r4 for the first group, r5 for the second).
# Next round, move these into the first-50 head, demoting the
# r6-checked entries — every workload keeps a driver hash check within
# two rounds.
_R7_ROTATE_IN = [
    # r4-checked, did not fit this round's head
    "range_clicks_per_purchase_hour",
    "simulated_sensor_rollup", "scd2_customer_batches",
    "detect_event_phases",
    "streaming_user_sessions",
    "ivf_ann_neighbors", "groupingsets_flag_status",
    "median_acctbal_by_segment", "cheapest_part_per_brand",
    "intersect_repeat_customers", "skew_salted_event_join",
    "window_price_change", "date_dimension_calendar",
    # r5-checked basics head, due again in r7
    "agg_having_suppliers", "window_running_revenue",
    "dedup_latest_order", "pivot_qty_by_status",
]

_unknown_rotate = (set(_R6_ROTATE_IN) | set(_R7_ROTATE_IN)) - set(_ALL_QUERIES)
if _unknown_rotate:  # fail loudly: a stale queue would silently shrink
    raise RuntimeError(  # the next round's driver-checked head
        f"rotation queue names unknown workloads: {sorted(_unknown_rotate)}"
    )

_HEAD = [
    k for k in _R6_ROTATE_IN + _R6_NEW + _R4_CHECKED_REFRESH
    if k in _ALL_QUERIES
]
_ORDER = _HEAD + [k for k in _ALL_QUERIES if k not in set(_HEAD)]
QUERIES = {k: _ALL_QUERIES[k] for k in _ORDER}
ORACLES = {k: _ALL_ORACLES[k] for k in _ORDER if k in _ALL_ORACLES}

__all__ = ["QUERIES", "ORACLES"]

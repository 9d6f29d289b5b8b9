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
# task 2). Round 7 executes the staged rotation (VERDICT r6 task 1),
# widened from the 17 staged entries to ALL 25 workloads whose last
# driver check was r4 or earlier (cross-checked against the committed
# CORRECTNESS_r05/r06 key sets): the staged 13 r4-era entries plus the
# TPC-H mid-range (q4,q6-q9,q13-q15,q17-q19,q22) and the two
# rows-only-by-design sketch estimators. Then this round's brand-new
# workloads, then the oldest r5-checked entries to fill the head to 50.
_R7_ROTATE_IN = [
    "intersect_repeat_customers", "corpus_overlap_halves",
    "approx_distinct_fingerprints", "range_clicks_per_purchase_hour",
    "simulated_sensor_rollup", "scd2_customer_batches",
    "detect_event_phases", "streaming_user_sessions",
    "skew_salted_event_join", "median_acctbal_by_segment",
    "cheapest_part_per_brand", "q6_forecast_revenue",
    "q7_nation_volume", "q14_promo_revenue", "q18_large_orders",
    "groupingsets_flag_status", "ivf_ann_neighbors",
    "q4_order_priority", "q8_market_share", "q9_product_profit",
    "q13_customer_distribution", "q15_top_supplier",
    "q17_small_quantity_revenue", "q19_bracket_revenue",
    "q22_inactive_balances",
]

# Workloads declared for the first time in round 7 — never driver-
# checked, so they go right after the rotated-in block.
_R7_NEW = [
    "sample_seeded_docs", "multimodal_audio_features",
    "bloom_semijoin_orders", "lm_quality_docs",
    "kmeans_clusters_embeddings",
]

# Oldest r5-checked entries (in their r5 head order) — fill the head
# to 50. The rest of the r5-checked set is staged in _R8_ROTATE_IN.
_R5_CHECKED_REFRESH = [
    "agg_having_suppliers", "window_running_revenue",
    "dedup_latest_order", "anti_inactive_customers",
    "semi_urgent_customers", "topk_parts_per_brand",
    "full_outer_nation_presence", "pivot_qty_by_status",
    "json_event_props", "split_events_by_day", "case_when_priority",
    "date_parts_orders", "shipping_delay", "string_ops_customers",
    "surrogate_keys_nation", "segment_mapping",
    "fill_replace_segments", "union_segments", "explode_part_words",
    "flag_order_issues", "distinct_segment_nation",
    "lookup_nation_names", "date_dimension_calendar",
]

# ROUND-8 ROTATION QUEUE: the r5-checked entries that did not fit this
# round's head — after r7 they are the oldest-checked set. Next round,
# move these into the first-50 head (plus any r8-new workloads),
# demoting the r7-checked entries.
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

_unknown_rotate = (
    set(_R7_ROTATE_IN) | set(_R7_NEW) | set(_R5_CHECKED_REFRESH)
    | set(_R8_ROTATE_IN)
) - set(_ALL_QUERIES)
if _unknown_rotate:  # fail loudly: a stale queue would silently shrink
    raise RuntimeError(  # the next round's driver-checked head
        f"rotation queue names unknown workloads: {sorted(_unknown_rotate)}"
    )

_HEAD = [
    k for k in _R7_ROTATE_IN + _R7_NEW + _R5_CHECKED_REFRESH
    if k in _ALL_QUERIES
][:50]
_ORDER = _HEAD + [k for k in _ALL_QUERIES if k not in set(_HEAD)]
QUERIES = {k: _ALL_QUERIES[k] for k in _ORDER}
ORACLES = {k: _ALL_ORACLES[k] for k in _ORDER if k in _ALL_ORACLES}

__all__ = ["QUERIES", "ORACLES"]

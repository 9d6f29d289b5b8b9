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
# task 2): round 4 sampled the distinctive operators first; round 5
# moves the 34 formerly-tail basics to the head, followed by the
# workloads new this round, with the r4-verified distinctive set now
# forming the tail (covered by the committed ORACLE_r05.log + pytest).
_ROTATED_HEAD = [
    "agg_having_suppliers", "window_running_revenue", "dedup_latest_order",
    "anti_inactive_customers", "semi_urgent_customers",
    "topk_parts_per_brand", "full_outer_nation_presence",
    "pivot_qty_by_status", "json_event_props", "split_events_by_day",
    "case_when_priority", "date_parts_orders", "shipping_delay",
    "string_ops_customers", "surrogate_keys_nation", "segment_mapping",
    "fill_replace_segments", "union_segments", "explode_part_words",
    "flag_order_issues", "distinct_segment_nation", "lookup_nation_names",
    "date_dimension_calendar", "convert_event_values",
    "unpivot_flag_metrics", "window_price_change",
    "token_counts_by_source", "fingerprint_by_source",
    "lang_stopword_profile", "language_guesses",
    # cube_flag_status / rollup_orders_year_priority were driver-hash-
    # checked in round 4 (VERDICT r4 §2.5); except_lapsed_customers /
    # intersect_repeat_customers are thin set-op wrappers with r1-r3
    # driver checks plus dedicated pytest coverage. All four yield
    # their sample slots to never-driver-checked round-5 additions and
    # sit in the tail under the committed oracle log.
]

# Workloads declared for the first time in round 5 — never driver-
# checked, so they go right after the rotated head (inside the first 50).
# (approx_distinct_fingerprints is rows-only by design — no hash oracle
# exists for it, so it yields the sample slot to a hash-checkable
# workload and sits in the tail with its bounded-error pytest.)
_R5_NEW = [
    "approx_percentiles_by_source",
    "dedup_incremental_docs",
    "q2_min_cost_supplier", "q11_important_parts", "q12_ship_latency",
    "q16_supplier_variety", "q20_excess_share_suppliers",
    "q21_waiting_suppliers", "mixture_weighted_sample",
    "schema_polish_customers", "convert_timezone_orders",
    "validate_orders_quality", "star_fact_orders",
    "delete_detection_customers", "incremental_agg_orders",
    "streaming_click_attribution", "resample_user_events",
    "funnel_view_click_purchase", "cohort_daily_retention",
    "outlier_events_zscore",
]

# ROUND-6 ROTATION QUEUE: workloads declared late in round 5 that have
# never had a driver-side hash check (covered this round only by the
# committed ORACLE_r05.log + pytest). Next round, move these into the
# first-50 head, demoting the r5-driver-verified entries above to the
# tail — every workload then has a driver hash check within two rounds.
_R6_ROTATE_IN = [
    "ewma_user_values", "outlier_events_mad", "fuzzy_match_parts",
    "spatial_customers_near_suppliers", "snapshot_cdc_customers",
    "decile_customer_spend", "split_documents_sets",
    "resample_interp_user_events", "conversion_latency_quartiles",
    "transition_matrix_events", "zorder_key_orders", "pps_sample_docs",
    "psychrometrics_events", "heavy_hitter_terms",
]

_unknown_rotate = set(_R6_ROTATE_IN) - set(_ALL_QUERIES)
if _unknown_rotate:  # fail loudly: a stale queue would silently shrink
    raise RuntimeError(  # the next round's driver-checked head
        f"_R6_ROTATE_IN names unknown workloads: {sorted(_unknown_rotate)}"
    )

_HEAD = [k for k in _ROTATED_HEAD + _R5_NEW if k in _ALL_QUERIES]
_ORDER = _HEAD + [k for k in _ALL_QUERIES if k not in set(_HEAD)]
QUERIES = {k: _ALL_QUERIES[k] for k in _ORDER}
ORACLES = {k: _ALL_ORACLES[k] for k in _ORDER if k in _ALL_ORACLES}

__all__ = ["QUERIES", "ORACLES"]

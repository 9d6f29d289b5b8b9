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
# workload gets a driver-side hash check within ~3 rounds (VERDICT r4
# task 2). Round 10 executes the queue staged in r9 (_R10_ROTATE_IN:
# the r9-rotation tail displaced by late-r9 additions, the displaced
# r7-checked fill, the rest of the r7-checked head, then the r8-checked
# head), then this round's brand-new workloads, then the oldest
# r9-checked entries (in their r9 head order) to fill to 50. The
# r9-checked head (minus whatever fills r10) is staged as _R11.
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
    "semantic_revenue_by_segment",
]

# Workloads declared for the first time in round 9 — never driver-
# checked, so they go right after the rotated-in block.
_R9_NEW = [
    "gopher_quality_docs", "duplicate_ngram_spans",
    "lm_perplexity_buckets", "cms_heavy_terms", "ann_recall_lsh",
    "random_projection_embeddings", "bm25_search_docs",
    "remove_dup_spans_docs", "curation_funnel_docs",
    "cms_incremental_terms", "rp_ann_recall", "streaming_cms_terms",
    "epoch_mixture_docs", "hybrid_search_docs", "source_kl_docs",
]

# Oldest r7-checked entries (in their r7 head order) — fill the head
# to 50. The rest of the r7-checked set is staged in _R10_ROTATE_IN.
_R7_CHECKED_FILL = [
    "intersect_repeat_customers", "corpus_overlap_halves",
    "approx_distinct_fingerprints", "range_clicks_per_purchase_hour",
    "simulated_sensor_rollup", "scd2_customer_batches",
    "detect_event_phases", "streaming_user_sessions",
    "skew_salted_event_join", "median_acctbal_by_segment",
    "cheapest_part_per_brand", "q6_forecast_revenue",
]

# ROUND-10 ROTATION QUEUE: after r9 the oldest-checked set is the rest
# of the r7-checked head (everything in CORRECTNESS_r07.json's head not
# re-checked above — including the 9 fill entries the r9-new workloads
# displaced from this round's head), then the r8-checked head in its r8
# order. Next round, move these into the first-50 head (plus any
# r10-new workloads), demoting the r9-checked entries.
_R10_ROTATE_IN = [
    # _R9_ROTATE_IN tail displaced from the r9 head by the late-r9
    # new workloads, then the displaced _R7_CHECKED_FILL entries
    "streaming_hourly_events", "multimodal_image_features",
    "asof_click_purchase",
    "intersect_repeat_customers",
    "corpus_overlap_halves", "approx_distinct_fingerprints",
    "range_clicks_per_purchase_hour", "simulated_sensor_rollup",
    "scd2_customer_batches", "detect_event_phases",
    "streaming_user_sessions", "skew_salted_event_join",
    "median_acctbal_by_segment", "cheapest_part_per_brand",
    "q6_forecast_revenue",
    # rest of the r7-checked head
    "q7_nation_volume", "q14_promo_revenue", "q18_large_orders",
    "groupingsets_flag_status", "ivf_ann_neighbors",
    "q4_order_priority", "q8_market_share", "q9_product_profit",
    "q13_customer_distribution", "q15_top_supplier",
    "q17_small_quantity_revenue", "q19_bracket_revenue",
    "q22_inactive_balances", "sample_seeded_docs",
    "multimodal_audio_features", "bloom_semijoin_orders",
    "lm_quality_docs", "kmeans_clusters_embeddings",
    # r8-checked head, in its r8 order
    "convert_event_values", "unpivot_flag_metrics",
    "window_price_change", "token_counts_by_source",
    "fingerprint_by_source", "lang_stopword_profile",
    "language_guesses", "approx_percentiles_by_source",
    "dedup_incremental_docs", "q2_min_cost_supplier",
    "q11_important_parts", "q12_ship_latency", "q16_supplier_variety",
]

# Workloads declared for the first time in round 10 — never driver-
# checked, so they go right after the rotated-in block.
_R10_NEW = [
    "clean_unicode_docs", "boilerplate_lines_docs",
    "shuffle_order_docs", "temperature_mixture_docs",
    "winnow_signals_docs", "lexical_diversity_sources",
    "script_profile_docs", "bpe_merge_candidates", "corpus_datacard",
    "winsorize_doc_lengths", "mmr_diverse_topk",
]

# The r9-checked head, in its r9 head order (= CORRECTNESS_r09.json's
# key set): fills r10 to 50 from the front; the remainder is the
# ROUND-11 ROTATION QUEUE. Next round: head = _R11_ROTATE_IN + any
# r11-new workloads + fill from the r10-checked head in ITS order.
_R9_CHECKED_HEAD = _R9_ROTATE_IN + _R9_NEW

_unknown_rotate = (
    set(_R9_ROTATE_IN) | set(_R9_NEW) | set(_R7_CHECKED_FILL)
    | set(_R10_ROTATE_IN) | set(_R10_NEW)
) - set(_ALL_QUERIES)
if _unknown_rotate:  # fail loudly: a stale queue would silently shrink
    raise RuntimeError(  # the next round's driver-checked head
        f"rotation queue names unknown workloads: {sorted(_unknown_rotate)}"
    )

# Head assembly (self-balancing): never-driver-checked NEW workloads
# are guaranteed a slot; the rotate-in queue fills the rest and its
# displaced TAIL rolls into next round's queue (the r9 convention);
# if room remains, refresh from the r9-checked head in its r9 order.
_rotate_room = max(0, 50 - len(_R10_NEW))
_HEAD = (
    _R10_ROTATE_IN[:_rotate_room] + _R10_NEW + _R9_CHECKED_HEAD
)[:50]
# next round's queue: the displaced rotate tail FIRST (oldest checked,
# already overdue), then the r9-checked head remainder
_R11_ROTATE_IN = _R10_ROTATE_IN[_rotate_room:] + [
    k for k in _R9_CHECKED_HEAD if k not in set(_HEAD)
]
_ORDER = _HEAD + [k for k in _ALL_QUERIES if k not in set(_HEAD)]
QUERIES = {k: _ALL_QUERIES[k] for k in _ORDER}
ORACLES = {k: _ALL_ORACLES[k] for k in _ORDER if k in _ALL_ORACLES}

__all__ = ["QUERIES", "ORACLES"]

"""Query-plan layer: the engine's declared query suite.

Each query is a named pair (Spark DataFrame plan builder, DuckDB oracle SQL)
registered in :mod:`.registry`. The driver's correctness gate runs both sides
at sf0.01 and compares row-count + schema + order-insensitive value hash.

Registration order is CURATED: the correctness driver verifies the first 50
registered queries, so the priority list below packs at least one
representative of every operator family (mapindex, streaming, SQL surface,
LLM dedup/similarity/multimodal/text, window/as-of/eventstream relational
shapes, subquery and TPC-H join shapes, UDAF) into that window. The long
tail — mostly scalar-function variants and extra TPC-H shapes of families
already represented — registers after.
"""

from mapreduceindex_demo_spark.plans.registry import QUERIES, Query, query  # noqa: F401

# Importing the suite modules populates QUERIES.
from mapreduceindex_demo_spark.plans import relational  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import mapindex_queries  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import llm  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import streaming_queries  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import sql_surface  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import subqueries  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import tpch_more  # noqa: F401,E402

#: The 50 queries the driver's correctness gate will check, in order.
#: ROTATED each round: queries whose green driver row already exists in a
#: committed CORRECTNESS_r{N}.json rotate OUT in favor of registered
#: queries never externally checked, so external verification accumulates
#: over the whole suite. Hard constraints, MACHINE-ENFORCED by
#: tests/test_coverage_integrity.py: (a) every operator family keeps ≥1
#: representative in the window, and (b) every query rotated OUT must be
#: green in some committed CORRECTNESS_r*.json — a query may never leave
#: the window without at least one external green row (the r1→r4 gap the
#: r4 verdict flagged). Any query whose implementation or oracle changed
#: this round stays in for re-verification.
PRIORITY_50 = [
    # --- r5 closes the external-verification debt: the 5 queries that had
    # never had an external row (r4 verdict item 2) ---
    "events_map_functions",
    "funnel_view_click_purchase",
    "weekly_retention_cohorts",
    "text_repetition_filter",
    "training_mix_weights",
    # --- changed this round: trained IVF centroids ---
    "similarity_ivf_ann",
    # --- new this round: PII redaction, TF-IDF, unigram-LM quality ---
    "text_pii_redaction",
    "text_tfidf_top_terms",
    "text_unigram_logprob",
    # --- map-index subsystem (SURVEY M1-M9, P1, A8, D3, S1); multiply-green
    # build/stats rows rotated out per r4 verdict item 2 ---
    "mapindex_array_build",
    "mapindex_function_build",
    "mapindex_scan_range",
    "mapindex_incremental_cdc",
    "mapindex_collated_scan",
    # --- new this round: durable persistence (r4 verdict item 4) ---
    "mapindex_durable_cdc",
    # --- single-green r4 rows: keep one more external confirmation ---
    "user_sessionization",
    "embedding_int8_quantization",
    "multimodal_feature_extract",
    "streaming_sliding_counts",
    "streaming_dedup_users",
    "similarity_lsh_buckets",
    "multimodal_frame_sample",
    "balanced_source_sample",
    "frequent_bigrams_per_lang",
    "training_sequence_packing",
    "dedup_apply_neardup_free",
    "small_qty_revenue_by_brand",
    "large_volume_customers",
    "min_offer_supplier_per_part",
    "suppliers_above_nation_avg",
    "churned_customer_segments",
    "promo_revenue_share_monthly",
    "product_profit_by_nation_year",
    "important_parts_by_value",
    "late_shipment_priority_counts",
    "customer_order_count_distribution",
    "top_revenue_supplier",
    "supplier_count_by_part_attrs",
    "bracketed_discounted_revenue",
    "blocking_suppliers",
    "idle_customer_balance_by_prefix",
    # --- family-guard representatives (already green in r03+r04) ---
    "streaming_tumbling_counts",
    "streaming_interval_join",
    "streaming_index_maintenance",
    "stateful_running_counters",
    "sql_grouping_sets",
    "mapreduce_wordcount",
    "purchase_last_click_asof",
    "udaf_weighted_avg_pandas",
    # --- bench headliners: keep the BENCH set externally re-verified ---
    "nation_market_share_yearly",
]


def _curate() -> None:
    missing = [n for n in PRIORITY_50 if n not in QUERIES]
    if missing:
        raise RuntimeError(f"PRIORITY_50 names not registered: {missing}")
    if len(PRIORITY_50) != len(set(PRIORITY_50)):
        raise RuntimeError("PRIORITY_50 contains duplicates")
    head = set(PRIORITY_50)
    ordered = {n: QUERIES[n] for n in PRIORITY_50}
    ordered.update({n: q for n, q in QUERIES.items() if n not in head})
    QUERIES.clear()
    QUERIES.update(ordered)


_curate()

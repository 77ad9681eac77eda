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
from mapreduceindex_demo_spark.plans import search  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import curation_ops  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import vector_ops  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import corpus_ops  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import graph_queries  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import timeseries_ops  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import quality_audit  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import setsim  # noqa: F401,E402
from mapreduceindex_demo_spark.plans import mining_ops  # noqa: F401,E402

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
    # --- r9 rotation (the r8 verdict's top item): clear the r1-era
    # single-green tail. All 21 remaining r1-singles (the PRIORITY_50
    # waiting list carried since r8) rotate IN for second external
    # confirmations, plus the three r7-single mapindex rows and the six
    # oldest r3-singles; multiply-confirmed r8 rows rotate OUT. Family
    # constraints (tests/test_coverage_integrity.py) are honored below;
    # choice-family guards pick the member with the OLDEST last green.
    # ---
    # NEW this round (zero external rows) + changed-this-round rows —
    # in-window by the machine-enforced rule:
    # a-priori round 2: frequent triples from frequent pairs (r8 item 7)
    "basket_frequent_triples",
    # changed r9: absolute minsup replaces the scale-buggy relative floor
    # (r8 item 6)
    "basket_frequent_pairs",
    # NEW this round (zero external rows): Hamming-radius perceptual
    # near-dup via the lossless 4x16-bit banded multi-index (r8 item 3);
    # also the multimodal family rep
    "multimodal_ahash_neardup",
    # changed r9: distributed sorted-neighborhood rewrite — composite
    # (block, chunk) windows with w-row overlap replace the
    # 25-task-forever nation window (r8 item 2)
    "er_sorted_neighborhood",
    # changed r9 and reverted same round: the shared-shingle-frame persist
    # (r8 item 5) was MEASURED at x3/x10 and rejected — x10 thrashed from
    # ~41 s to 20+ min (BASELINE.md round 9); the shipped plan is
    # code-identical to r8 plus the measurement comment, in-window for
    # external re-confirmation of the final state
    "dedup_setsim_prefix_join",
    # --- single-member family guards (machine-enforced) ---
    "streaming_interval_join",
    "streaming_index_maintenance",
    "stateful_running_counters",
    "sql_grouping_sets",
    "embedding_int8_quantization",
    "mapreduce_wordcount",
    "purchase_last_click_asof",
    "udaf_weighted_avg_pandas",
    # --- choice family guards, oldest last-green member preferred ---
    "streaming_session_windows",   # last green r7 (tumbling: r8)
    "balanced_source_sample",      # last green r7 (curated: r8)
    "user_sessionization",         # last green r7 (running_spend: r8)
    "suppliers_above_nation_avg",  # last green r7 (skew_salted: r8)
    "nation_market_share_yearly",  # last green r7 (blocking: r8)
    # --- mapindex delegation (>=5 in-window): the three r7-single view/
    # scan rows get their second confirmation; incremental + build paths
    # stay represented by their freshest members ---
    "mapindex_reduce_view_minmax",
    "mapindex_scan_intersect",
    "mapindex_scan_union",
    "mapindex_incremental_cdc",
    "mapindex_expr_build",
    # --- the 21 r1-era singles: every remaining query whose only green
    # predates the round-2+ testdata regenerations (second confirmation
    # clears the r1 tail completely) ---
    "big_spender_customers",
    "cube_status_priority",
    "customer_order_stats",
    "customer_rolling_30d_spend",
    "document_array_functions",
    "forecast_revenue_change",
    "lineitem_math_functions",
    "lineitem_percentiles",
    "nation_presence_setops",
    "order_conditional_functions",
    "order_priority_check",
    "orderless_customers",
    "orders_above_customer_average",
    "orders_column_profile",
    "part_string_functions",
    "priority_distinct_customers",
    "rollup_returnflag_status",
    "shipments_within_90_days",
    "top100_expensive_items",
    "top_orders_per_customer",
    "top_returning_customers",
    # --- the six oldest r3-era singles (these also keep the dedup /
    # similarity / events / text families represented) ---
    "dedup_cross_source_contamination",
    "dedup_embedding_neardup_top20",
    "dedup_simhash",
    "events_value_buckets",
    "text_fingerprint",
    "similarity_lsh_ann",
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

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
    # --- r10 rotation: keep clearing the single-green tail (r9 verdict
    # item 1) — all 3 r3-singles + all 8 r5-singles + 15 of the 19
    # r6-singles get their second external confirmation; the remaining 4
    # r6 singles (sketch_cms_heavy_hitters, streaming_drift_daily,
    # training_mix_apply, zorder_box_aggregate) plus the r7/r8 tails are
    # the r11 waiting list. Family constraints (tests/
    # test_coverage_integrity.py) honored below; choice-family guards
    # pick the member with the OLDEST last green.
    # ---
    # NEW this round (zero external rows) — in-window by the machine-
    # enforced rule:
    # radius-3 pairs -> connected components -> dedup decision (r9
    # verdict item 2: the image twin of the LSH->components text path)
    "multimodal_ahash_clusters",
    # multi-pass SNM under an independent reversed-name sort key (r9
    # verdict item 5)
    "er_snm_multipass",
    # --- r9 singles kept for their second confirmation (r9 verdict
    # item 8); multimodal_ahash_neardup also changed r10 (its banded
    # pair kernel is now the shared _ahash_neardup_pairs helper) ---
    "basket_frequent_triples",
    "multimodal_ahash_neardup",
    # --- changed this round ---
    # single-exchange respelling of the a-priori round-1 plan (r9
    # verdict item 3: drop the standalone 60M-row distinct exchange)
    "basket_frequent_pairs",
    # refactored r10: steps 1-3 now live in the shared
    # _snm_neighbor_pairs helper feeding both SNM passes
    "er_sorted_neighborhood",
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
    "streaming_tumbling_counts",   # last green r8 (session: r9)
    "curated_training_set",        # last green r8 (balanced: r9)
    "customer_running_spend",      # last green r8 (sessionization: r9)
    "skew_salted_join_volume",     # last green r8 (suppliers_above: r9)
    "blocking_suppliers",          # last green r8 (nation_market: r9)
    # --- mapindex delegation (>=5 in-window): the five OLDEST last-green
    # members (r4/r5) get fresh confirmations ---
    "mapindex_primary_build",
    "mapindex_stats",
    "mapindex_stats_approx",
    "mapindex_array_build",
    "mapindex_collated_scan",
    # --- the 3 r3-era singles (oldest-first, r9 verdict item 1) ---
    "lineitem_percentiles_approx",
    "similarity_topk_cosine",
    "text_hash_sample",
    # --- the 8 r5-era singles ---
    "events_map_functions",
    "funnel_view_click_purchase",
    "text_pii_redaction",
    "text_repetition_filter",
    "text_tfidf_top_terms",
    "text_unigram_logprob",
    "training_mix_weights",
    "weekly_retention_cohorts",
    # --- 15 of the 19 r6-era singles (window is full; the other 4 are
    # named in the header comment as the r11 carry-over) ---
    "dedup_incremental_arrivals",
    "dedup_semantic_cells",
    "excess_stock_suppliers",
    "search_bm25_indexed",
    "search_bm25_topk",
    "search_boolean_and",
    "search_hybrid_rrf",
    "search_phrase_positional",
    "search_prefix_scan",
    "search_proximity_window",
    "similarity_ivf_batch",
    "similarity_ivf_durable",
    "similarity_ivf_filtered",
    "similarity_ivf_recall",
    "similarity_label_mrr",
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

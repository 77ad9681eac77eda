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
    # --- r15 rotation (the r14 verdict's item 2): the nine r14-new
    # operators hold exactly one external green each — they stay in for
    # their SECOND greens, closing the >=2-external-greens program for
    # every query registered before this round. Several are ALSO in by
    # the changed-this-round rule (the SoftDedup scan-local fold, the
    # nDCG single-pass respelling, the winnowing lowered-length window
    # bound, the LPA/WordPiece cache-discipline respelling). ---
    "text_kneser_ney_bigram",
    "dedup_winnowing_pairs",
    "dedup_winnowing_clusters",
    "text_heaps_law_fit",
    "graph_label_propagation",      # changed: lazy-chain + unpersist rounds
    "similarity_ndcg_eval",         # changed: single-pass two-window plan
    "text_wordpiece_train_merges",  # changed: collected argmax rounds
    "streaming_left_interval_join",
    "curation_soft_dedup_weights",  # changed: scan-local (gram, c) fold
    # --- changed this round (re-verification rule): the BPE training
    # loop now collects its 1-row argmax per round and unpersists
    # superseded word-type caches (r14 ADVICE) ---
    "text_bpe_train_merges",
    "text_bpe_apply_merges",
    # --- NEW this round (zero external rows — machine-enforced
    # in-window): Moore-Lewis cross-entropy selection, UniMax sampling
    # budgets, Good-Turing smoothing, onion duplicate-chunk gating, RAKE
    # and TextRank keyword extraction, SemDeDup semantic dedup, and the
    # full-outer stream-stream interval join ---
    "curation_moore_lewis_select",
    "curation_unimax_budgets",
    "text_good_turing_smoothing",
    "dedup_onion_chunk_gate",
    "text_rake_keywords",
    "text_textrank_keywords",
    "dedup_semdedup_cells",
    "streaming_full_interval_join",
    # --- single-member family guards (machine-enforced) ---
    "streaming_interval_join",
    "streaming_index_maintenance",
    "stateful_running_counters",
    "sql_grouping_sets",
    "embedding_int8_quantization",
    "mapreduce_wordcount",
    "purchase_last_click_asof",
    "udaf_weighted_avg_pandas",
    # --- choice family guards, oldest last-green member ---
    "streaming_tumbling_counts",   # last green r13 (session: r14)
    "multimodal_frame_sample",     # last green r5 — oldest multimodal
    "curated_training_set",        # last green r13 (balanced: r14)
    "events_json_extract",         # last green r6 — oldest events
    "customer_running_spend",      # last green r13 (sessionization: r14)
    "skew_salted_join_volume",     # last green r13 (above_nation_avg: r14)
    "blocking_suppliers",          # last green r13 (market_share: r14)
    # --- mapindex delegation (>=5 in-window): the five OLDEST last-green
    # members (r11/r12) ---
    "mapindex_stats",
    "mapindex_stats_approx",
    "mapindex_bins",
    "mapindex_durable_cdc",
    "mapindex_function_build",
    # --- spare slots: the 11 OLDEST-last-green queries (r5) get third
    # confirmations ---
    "churned_customer_segments",
    "customer_order_count_distribution",
    "frequent_bigrams_per_lang",
    "idle_customer_balance_by_prefix",
    "important_parts_by_value",
    "large_volume_customers",
    "late_shipment_priority_counts",
    "min_offer_supplier_per_part",
    "product_profit_by_nation_year",
    "promo_revenue_share_monthly",
    "small_qty_revenue_by_brand",
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

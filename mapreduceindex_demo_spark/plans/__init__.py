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
    # --- r12 rotation (round 11 had zero builder turns — this executes
    # the carried r11 plan): clear the r6 single-green tail (4) and ALL
    # 23 r7 singles, plus one r8 single in the remaining slot; the other
    # 18 r8 singles (curation_pareto_frontier, events_changepoint_scan,
    # events_gap_fill_hourly, events_scd2_temporal_join,
    # feature_target_encoding, graph_pagerank_topk, graph_triangle_count,
    # purchase_linear_attribution, quality_benford_audit,
    # quality_constraint_audit, quality_psi_drift, similarity_hamming_ann,
    # similarity_ivf_pq_ann, similarity_pq_adc_ann,
    # similarity_projection_recall, text_chisq_feature_select,
    # text_pmi_collocations, text_shingle_novelty) are the r13 waiting
    # list. Family constraints (tests/test_coverage_integrity.py)
    # honored below; choice-family guards pick the member with the
    # OLDEST last green.
    # ---
    # NEW this round (zero external rows) — in-window by the machine-
    # enforced rule: the image-dedup ACTION (doc-level drop ledger from
    # the clusters decision — r10/r11 verdict item)
    "multimodal_ahash_apply",
    # --- changed this round ---
    # SNM rank scheme: the offsets join is now UN-hinted (the r11 ADVICE
    # scale-safety fix) and the multipass gained an independent
    # account-balance third pass — both SNM queries re-verify
    "er_snm_multipass",
    "er_sorted_neighborhood",
    # clusters refactored onto the shared _ahash_hash_labels helper
    # feeding the new APPLY query
    "multimodal_ahash_clusters",
    # --- single-member family guards (machine-enforced) ---
    "streaming_interval_join",
    "streaming_index_maintenance",
    "stateful_running_counters",
    "sql_grouping_sets",
    "embedding_int8_quantization",
    "mapreduce_wordcount",
    "purchase_last_click_asof",
    "udaf_weighted_avg_pandas",
    # --- choice family guards, oldest last-green member preferred (all
    # five r11-window members were re-greened r10+r11; these five are
    # r9-last-green) ---
    "streaming_session_windows",   # last green r9 (tumbling: r11)
    "balanced_source_sample",      # last green r9 (curated: r11)
    "user_sessionization",         # last green r9 (running_spend: r11)
    "suppliers_above_nation_avg",  # last green r9 (skew_salted: r11)
    "nation_market_share_yearly",  # last green r9 (blocking: r11)
    # --- mapindex delegation (>=5 in-window): the five OLDEST last-green
    # members (r5/r7/r8) get fresh confirmations ---
    "mapindex_function_build",
    "mapindex_scan_range",
    "mapindex_durable_cdc",
    "mapindex_bins",
    "mapindex_reduce_view",
    # --- the 4 r6-era singles (the carry-over named since r10) ---
    "sketch_cms_heavy_hitters",
    "streaming_drift_daily",
    "training_mix_apply",
    "zorder_box_aggregate",
    # --- all 23 r7-era singles ---
    "cdc_snapshot_diff",
    "curation_token_budget",
    "curation_weighted_sample",
    "dedup_apply_keep_best",
    "dedup_boilerplate_prefix",
    "dedup_cdc_segments",
    "dedup_containment_top20",
    "dedup_eval_overlap_rate",
    "dedup_lsh_recall_contract",
    "embedding_source_centroids",
    "events_anomaly_daily",
    "events_transition_matrix",
    "multimodal_resize_downsample",
    "quality_percentile_gate",
    "search_snippet_highlight",
    "similarity_ivf_health",
    "similarity_mmr_rerank",
    "similarity_truncation_contract",
    "split_leakproof_assignment",
    "text_bigram_logprob",
    "text_c4_style_gate",
    "text_char_entropy_gate",
    "text_vocab_coverage",
    # --- 1 r8-era single in the remaining slot (kin to this round's new
    # multimodal work) ---
    "multimodal_ahash_dedup",
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

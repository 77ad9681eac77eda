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
    # --- r7 rotation. All 139 registered queries have ≥1 committed
    # external green row (r6 closed the last zero-green set), so this
    # window maximizes SECOND/THIRD confirmations, oldest-first: the 20
    # r1-single rows (their only green predates five rounds of testdata
    # regeneration) plus the r3-single family guards rotate IN; the
    # multiply-confirmed r5/r6 rows rotate OUT. Family constraints
    # (machine-enforced in tests/test_coverage_integrity.py) and the
    # changed-stays-in rule are both honored below. ---
    # --- changed THIS round (ADVICE fixes — stay in for external
    # re-verification): NULL-gated LSH band hashes feed the five band
    # consumers; on_map NULL guard (lsh_mapindex); cached durable-probe
    # artifact; shared unigram-KL helper (drift + scorecard) ---
    # --- NEW this session (zero external rows — must be in-window):
    # shingle-containment ranking on the shared pair table (whose column
    # set grew this session — its other consumers jaccard_top20 +
    # lsh_recall_contract stay in under the changed-stays-in rule),
    # the char-entropy quality gate, and the measured Bloom-filter
    # semi-join prune. Displace dedup_minhash_lsh_pairs /
    # dedup_minhash_components / dedup_apply_neardup_free (all
    # multiply-green, re-confirmed r6; dedup family keeps ≥8 in-window
    # reps). ---
    "dedup_containment_top20",
    "text_char_entropy_gate",
    "sketch_bloom_prune",
    "dedup_neardup_contamination",
    "dedup_decontaminate_apply",
    "dedup_lsh_mapindex",
    "dedup_incremental_durable_probe",
    "text_unigram_drift",
    "source_quality_scorecard",
    # --- mapindex delegation (≥5 in-window): the three r6-single view
    # rows get their second confirmation; expr_build/bins are the
    # family's stalest multi rows (last green r4) ---
    # NEW this session (zero external rows): the UnionScan twin of the
    # intersect scan below. Displaces mapindex_reduce_view_durable
    # (r6-green); family in-window count stays 5 with the union.
    "mapindex_scan_union",
    # NEW this session (zero external rows): per-source embedding-centroid
    # drift monitor (exact micro-unit integer statistics) and MMR
    # diversified top-k (fixed-k greedy, lazily chained — no collects).
    # Displace mapindex_reduce_view / mapindex_sketch_view (both r6-green;
    # family in-window count stays ≥5).
    "embedding_source_centroids",
    "similarity_mmr_rerank",
    # NEW this session (zero external rows): index-intersection scan —
    # two secondary indexes ANDed on doc id (N1QL IntersectScan shape).
    # Displaces expr_build/bins (both multiply-green, last r4; family
    # in-window count stays ≥5).
    "mapindex_scan_intersect",
    # --- family guards, fewest/oldest external rows preferred ---
    "streaming_session_windows",
    "streaming_interval_join",
    "streaming_index_maintenance",
    "stateful_running_counters",
    "sql_grouping_sets",
    "user_sessionization",
    "purchase_last_click_asof",
    "udaf_weighted_avg_pandas",
    "suppliers_above_nation_avg",
    "nation_market_share_yearly",
    "mapreduce_wordcount",
    "embedding_int8_quantization",
    "balanced_source_sample",
    # NEW this session (zero external rows): the resize op completing the
    # multimodal decode/extract/resize/frame-sample quartet. Displaces
    # multimodal_binary_stats (r3-green + parity) as the family guard.
    "multimodal_resize_downsample",
    # --- NEW this session (zero external rows — must be in-window):
    # C4-style rule gate with per-rule violation counts, boilerplate
    # prefix-family detector, deterministic token-budget selection, and
    # search snippet generation. Displace similarity_topk_cosine /
    # events_pivot_daily / rollup_returnflag_status (all multiply-green;
    # similarity keeps ivf_health + truncation_contract in-window,
    # events keeps anomaly_daily + transition_matrix). ---
    "text_c4_style_gate",
    "dedup_boilerplate_prefix",
    "curation_token_budget",
    "search_snippet_highlight",
    # --- NEW this round (zero external rows — must be in-window):
    # bigram-LM scoring, vocab coverage curve, leak-proof content-hash
    # splits, per-source quality percentile gate, daily anomaly monitor,
    # content-defined segment dedup. Each displaces one r1-single row
    # from the tail below (all keep their committed r1 green). ---
    "text_bigram_logprob",
    "text_vocab_coverage",
    "split_leakproof_assignment",
    "quality_percentile_gate",
    "events_anomaly_daily",
    "dedup_cdc_segments",
    # weighted A-Res sampling + the LSH dedup recall contract (the
    # latter also re-verifies the shared inverted-index pair helper
    # factored out of the Jaccard query this round)
    "curation_weighted_sample",
    "dedup_lsh_recall_contract",
    # the Jaccard top-20 itself was refactored onto the shared pair
    # helper this round (rounding/ordering moved to its outer select),
    # so it stays in for external re-verification per the hard rule —
    # the recall contract exercises only the helper's jac_raw tail
    "dedup_ngram_jaccard_top20",
    # span-hash universe refactored into a shared helper this round —
    # the span report re-verifies it alongside the new overlap rate
    "dedup_duplicated_spans",
    "dedup_eval_overlap_rate",
    "dedup_apply_keep_best",
    "events_transition_matrix",
    # min/max reduce-view measure (the opt-in non-self-maintainable
    # class, new this round — zero external rows)
    "mapindex_reduce_view_minmax",
    # both CDC flagships migrated onto the shared _five_batch_cdc
    # scaffold this session — changed paths re-verify in-window
    "mapindex_incremental_cdc",
    "mapindex_durable_cdc",
    "cdc_snapshot_diff",
    "similarity_ivf_health",
    "similarity_truncation_contract",
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

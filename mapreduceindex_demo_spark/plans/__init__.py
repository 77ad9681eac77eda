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
    # --- r14 rotation (the r13 verdict's item 1): the 12 queries holding
    # a single external green — the 11 r13/r13b-new published-method
    # operators plus graph_pagerank_topk (whose second-green slot was
    # ceded in r13, documented here since then) — collect their second
    # greens, closing the >=2-external-greens program for every
    # registered query. Two of them (embedding_anisotropy_abtt,
    # text_zipf_fit) are ALSO in by the changed-this-round rule: the
    # ABTT moment pass was respelled as Arrow-batched partial moments
    # (the r13 verdict's item 2) and the Zipf fit gained the
    # nullif-guarded denominators (r13 ADVICE). Family guards pick the
    # member with the OLDEST last green; the spare slots go to the
    # OLDEST-last-green queries overall (r3-r5) for third confirmations.
    # ---
    # --- the 12 second-green rows ---
    "curation_dsir_weights",
    "curation_dsir_sample",
    "text_gopher_gate",
    "text_ccnet_ppl_buckets",
    "curation_fasttext_gate",
    "text_bpe_train_merges",
    "text_bpe_apply_merges",
    "curation_kcenter_coreset",
    "embedding_anisotropy_abtt",   # changed: Arrow-batched moment pass
    "text_zipf_fit",               # changed: nullif-guarded denominators
    "graph_kcore_decomposition",
    "graph_pagerank_topk",
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
    "streaming_session_windows",   # last green r12 (tumbling: r13)
    "dedup_apply_neardup_free",    # last green r5 — oldest dedup
    "similarity_lsh_buckets",      # last green r5 — oldest similarity
    "multimodal_feature_extract",  # last green r5 — oldest multimodal
    "balanced_source_sample",      # last green r12 (curated_training: r13)
    "events_daily_rollup",         # last green r4 — oldest events
    "user_sessionization",         # last green r12 (running_spend: r13)
    "suppliers_above_nation_avg",  # last green r12 (skew_salted: r13)
    "nation_market_share_yearly",  # last green r12 (blocking: r13)
    # --- mapindex delegation (>=5 in-window): the five OLDEST last-green
    # members (r9/r11) ---
    "mapindex_expr_build",
    "mapindex_incremental_cdc",
    "mapindex_array_build",
    "mapindex_collated_scan",
    "mapindex_primary_build",
    # --- NEW this round (zero external rows — machine-enforced
    # in-window): interpolated Kneser-Ney bigram scoring (the KenLM
    # smoothing the CCNet-style filters actually run), winnowing
    # fingerprints (the MOSS local fingerprinting), the Heaps-law
    # vocabulary-growth fit (the Zipf diagnostic's twin),
    # label-propagation communities (the fifth classic graph operator),
    # and nDCG@10 graded retrieval evaluation ---
    "text_kneser_ney_bigram",
    "dedup_winnowing_pairs",
    "text_heaps_law_fit",
    "graph_label_propagation",
    "similarity_ndcg_eval",
    # --- NEW this round, second batch: WordPiece training (the BERT
    # likelihood-ratio merge rule) and the winnowing pairs->DECISION
    # clusters step ---
    "text_wordpiece_train_merges",
    "dedup_winnowing_clusters",
    # --- NEW this round, third batch: the outer twin of the
    # stream-stream interval join ---
    "streaming_left_interval_join",
    # --- NEW this round, fourth batch: SoftDedup duplication-aware
    # reweighting (the soft complement of the hard dedup APPLY ledgers)
    "curation_soft_dedup_weights",
    # --- spare slots: the 7 OLDEST-last-green queries (r3-r5) get
    # third confirmations (nine spare slots ceded to the r14-new
    # queries above) ---
    "text_langid_heuristic",       # r3
    "text_quality_score",          # r3
    "local_supplier_volume",       # r4
    "pricing_summary",             # r4
    "shipping_priority",           # r4
    "text_token_stats",            # r4
    "bracketed_discounted_revenue",  # r5
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

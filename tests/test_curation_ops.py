"""Spark-side invariants of the round-7b curation/search/index operators
(oracle parity itself is covered by tests/test_oracle_parity.py and the
driver gate — these check the properties parity can't see)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mapreduceindex_demo_spark.plans import QUERIES
from mapreduceindex_demo_spark.plans.curation_ops import _TOKEN_BUDGET
from mapreduceindex_demo_spark.session import load_table
from tests.conftest import PARITY_SF_DIR


def test_token_budget_never_exceeded_and_selection_nontrivial(spark):
    rows = QUERIES["curation_token_budget"].fn(spark, PARITY_SF_DIR).collect()
    assert rows, "no source selected anything"
    for r in rows:
        assert r.tokens_kept <= _TOKEN_BUDGET, r
        assert r.docs_kept >= 1
        assert 0.0 < r.budget_utilization <= 1.0
    total_docs = load_table(spark, PARITY_SF_DIR, "documents").count()
    # the budget binds: strictly fewer docs than the corpus are kept
    assert sum(r.docs_kept for r in rows) < total_docs


def test_token_budget_selection_is_resumable_prefix(spark):
    """Doubling the budget must KEEP every doc the smaller budget chose
    (selection order is a pure function of doc ids) — re-derive both
    selections with the query's own ordering rule and compare."""
    from pyspark.sql import Window

    d = load_table(spark, PARITY_SF_DIR, "documents").select(
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ntok"),
        F.md5(F.col("doc_id").cast("string")).alias("pri"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("pri")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = d.withColumn("cum", F.sum("ntok").over(w))
    small = {r.doc_id for r in cum.where(F.col("cum") <= _TOKEN_BUDGET).collect()}
    big = {
        r.doc_id for r in cum.where(F.col("cum") <= 2 * _TOKEN_BUDGET).collect()
    }
    assert small < big


def test_boilerplate_families_are_real_prefix_groups(spark):
    out = QUERIES["dedup_boilerplate_prefix"].fn(spark, PARITY_SF_DIR)
    rows = out.collect()
    assert rows, "generated corpus has exact dups, so prefix families exist"
    for r in rows:
        assert r.n_docs >= 2
        assert 1 <= r.n_sources <= r.n_docs
        assert r.min_doc <= r.max_doc


def test_snippet_contains_term_and_plan_is_scan_local(spark):
    q = QUERIES["search_snippet_highlight"]
    df = q.fn(spark, PARITY_SF_DIR)
    rows = df.collect()
    assert len(rows) == 10
    for r in rows:
        assert "vector" in r.snippet.split(" ")
        assert r.tf >= 1 and r.first_pos >= 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    # no explode (Generate) — token windowing is array-expression local;
    # top-k is the heap, not a global sort
    assert "Generate" not in plan
    assert "TakeOrderedAndProject" in plan


def test_c4_gate_counts_are_consistent(spark):
    rows = QUERIES["text_c4_style_gate"].fn(spark, PARITY_SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.kept <= r.docs
        for f in (r.fail_short, r.fail_wordlen, r.fail_stopword, r.fail_diversity):
            assert 0 <= f <= r.docs
        # a doc failing any rule is not kept
        assert r.kept <= r.docs - max(
            r.fail_short, r.fail_wordlen, r.fail_stopword, r.fail_diversity
        )
        assert 0.0 <= r.retention <= 1.0
    # every rule discriminates somewhere in the corpus
    assert sum(r.fail_short for r in rows) > 0
    assert sum(r.fail_wordlen for r in rows) > 0
    assert sum(r.fail_stopword for r in rows) > 0
    assert sum(r.fail_diversity for r in rows) > 0


def test_scan_intersect_matches_direct_predicate(spark):
    got = {
        r.doc_id
        for r in QUERIES["mapindex_scan_intersect"].fn(spark, PARITY_SF_DIR).collect()
    }
    d = load_table(spark, PARITY_SF_DIR, "documents")
    want = {
        r.doc_id
        for r in d.where(
            (F.col("source") == "src3")
            & F.size(F.split(F.col("text"), " ")).between(25, 60)
        )
        .select("doc_id")
        .collect()
    }
    assert got == want and got


def test_scan_union_matches_direct_predicate_and_dedupes(spark):
    got = [
        r.doc_id
        for r in QUERIES["mapindex_scan_union"].fn(spark, PARITY_SF_DIR).collect()
    ]
    assert len(got) == len(set(got)), "union scan must dedupe overlap"
    d = load_table(spark, PARITY_SF_DIR, "documents")
    want = {
        r.doc_id
        for r in d.where(
            (F.col("source") == "src3")
            | F.size(F.split(F.col("text"), " ")).between(80, 99)
        )
        .select("doc_id")
        .collect()
    }
    assert set(got) == want
    # the overlap is real: union output < sum of the two sides
    a = d.where(F.col("source") == "src3").count()
    b = d.where(F.size(F.split(F.col("text"), " ")).between(80, 99)).count()
    assert len(got) < a + b

"""Bucketed co-located join: the physical plan must have NO shuffle
(PLANS.md names orders ⋈ lineitem as the suite's one unavoidable big-big
shuffle; bucketing is the declared fix)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduceindex_demo_spark.session import load_table
from mapreduceindex_demo_spark.sources.bucketing import (
    co_located_join,
    write_bucketed,
)
from tests.conftest import SMOKE_SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # coalesce(1): one file per bucket, the precondition for Spark to trust
    # the sortBy order at read time (multi-file buckets fall back to Sort)
    orders = load_table(spark, SMOKE_SF_DIR, "orders").coalesce(1)
    lineitem = load_table(spark, SMOKE_SF_DIR, "lineitem").coalesce(1)
    write_bucketed(orders, "b_orders", 8, ["o_orderkey"], ["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", 8, ["l_orderkey"], ["l_orderkey"])
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path a 100 TB fact-fact join would take
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = co_located_join(spark, lt, rt, "o_orderkey", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # NOTE: a per-task Sort remains — since 3.0 Spark ignores sortBy
        # metadata at read time (multi-file buckets can't guarantee order;
        # legacy flag spark.sql.legacy.bucketedTableScan.outputOrdering).
        # The Sort is per-task CPU over already-co-located rows; the
        # network-cost Exchange is what bucketing removes.
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    orders = load_table(spark, SMOKE_SF_DIR, "orders")
    lineitem = load_table(spark, SMOKE_SF_DIR, "lineitem")
    expected = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    got = (
        co_located_join(spark, lt, rt, "o_orderkey", "l_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_bucketed_aggregation_reuses_placement(spark, bucketed_tables):
    """groupBy on the bucket key also needs no exchange before the final
    aggregate — pre-placement pays off beyond joins."""
    _, rt = bucketed_tables
    agg = (
        spark.table(rt)
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

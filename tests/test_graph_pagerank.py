"""Independent recomputation of the all-integer PageRank — a third
implementation (pure Python dicts) beside the Spark plan and the DuckDB
oracle, plus plan-shape and property checks."""

from __future__ import annotations

import duckdb
import pytest

from mapreduceindex_demo_spark.oracle_harness import engine_round
from mapreduceindex_demo_spark.plans import QUERIES
from mapreduceindex_demo_spark.plans.graph_queries import (
    _PR_DAMP,
    _PR_ITERS,
    _PR_SCALE,
    _PR_TOPK,
)
from tests.conftest import PARITY_SF_DIR


def _python_pagerank(edges, iters, damp, scale):
    """edges: {(u, v): w} directed (already symmetrized)."""
    outw: dict[str, int] = {}
    for (u, _), w in edges.items():
        outw[u] = outw.get(u, 0) + w
    nodes = sorted(outw)
    n = len(nodes)
    base = ((100 - damp) * scale) // (100 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for (u, v), w in edges.items():
            nxt[v] += (r[u] * damp * w) // (100 * outw[u])
        r = nxt
    return r


@pytest.fixture(scope="module")
def trade_edges():
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT 'c' || CAST(o_custkey AS VARCHAR),
               's' || CAST(l_suppkey AS VARCHAR),
               CAST(COUNT(*) AS BIGINT)
        FROM read_parquet('{PARITY_SF_DIR}/lineitem.parquet') l
        JOIN read_parquet('{PARITY_SF_DIR}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
        """
    ).fetchall()
    edges = {}
    for c, s, w in rows:
        edges[(c, s)] = w
        edges[(s, c)] = w
    return edges


def test_pagerank_matches_python_fixed_point(spark, trade_edges):
    r = _python_pagerank(trade_edges, _PR_ITERS, _PR_DAMP, _PR_SCALE)
    expect = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:_PR_TOPK]
    got = QUERIES["graph_pagerank_topk"].fn(spark, PARITY_SF_DIR).collect()
    assert [(row.node, row.rank_e12) for row in got] == expect
    for row in got:
        assert abs(row.rank - engine_round(row.rank_e12 / _PR_SCALE, 9)) < 1e-12


def test_pagerank_mass_and_ordering_properties(trade_edges):
    r = _python_pagerank(trade_edges, _PR_ITERS, _PR_DAMP, _PR_SCALE)
    total = sum(r.values())
    # flooring only ever LEAKS mass, and bounded by (|E|+|V|)·iters units
    leak_bound = (len(trade_edges) + len(r)) * _PR_ITERS + len(r)
    assert total <= _PR_SCALE
    assert total >= _PR_SCALE - leak_bound
    # a supplier shared by many customers must outrank any 1-customer peer:
    # check ranks aren't uniform (the iteration actually moved mass)
    assert len(set(r.values())) > 1


def test_pagerank_one_join_one_aggregate_per_iteration(spark):
    """Pregel shape, enforced: each of the 5 power iterations contributes
    exactly ONE rank-frame equi-join and one two-phase (map-side partial +
    final) groupBy(dst) aggregation; the only nested-loop joins are the
    1-row N/base broadcasts; the edge derivation never reappears
    (checkpointed once — the plan scans ExistingRDD, never lineitem)."""
    import re

    from mapreduceindex_demo_spark.plans.graph_queries import _PR_ITERS

    df = QUERIES["graph_pagerank_topk"].fn(spark, PARITY_SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    equi = sum(
        len(re.findall(p, plan))
        for p in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    assert equi == _PR_ITERS, plan
    # 1-row crossJoins only: nrow (once) + teleport base (once/iteration)
    assert len(re.findall(r"BroadcastNestedLoopJoin", plan)) == _PR_ITERS + 1, plan
    # two-phase aggregate per iteration (partial + final) — the map-side
    # combine that keeps the per-round shuffle at O(|V|) partial sums
    assert len(re.findall(r"HashAggregate", plan)) >= 2 * _PR_ITERS, plan
    assert len(re.findall(r"Scan ExistingRDD", plan)) >= 1, plan
    assert "lineitem" not in plan, plan

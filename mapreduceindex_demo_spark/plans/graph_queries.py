"""Graph-analytics queries (round 8): PageRank over a derived entity graph.

The suite's iterative-operator family had one member (connected components,
operators/graph.py — the dedup-cluster closer). PageRank is the second
classic Pregel shape: rank mass flows along edges for a fixed number of
power iterations. Curation pipelines use exactly this operator for
authority/centrality weighting of interlinked corpora (e.g. link-graph
quality priors for web crawl data à la Common Crawl harmonic centrality);
the demo graph here is the customer↔supplier trade graph (who trades with
whom, weighted by line-item count) since the testdata has no link column.

The reference has no iterative operator at all (its only loop is the
per-document map pipeline, SURVEY §2.2) — like components, this is
engine-completeness work beyond the reference surface.

Determinism: the all-integer formulation in operators/graph.py::pagerank —
rank mass on a 1e12-unit integer grid, integer-division contributions and
teleport base, so both engines reach a bit-identical fixed point and the
value-hash parity check is exact (no float summation order anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceindex_demo_spark.operators.graph import pagerank, triangle_stats
from mapreduceindex_demo_spark.plans.registry import query
from mapreduceindex_demo_spark.session import load_table

_PR_ITERS = 5
_PR_DAMP = 85  # percent
_PR_SCALE = 10**12
_PR_TOPK = 10


def _pr_oracle() -> str:
    base = f"(SELECT ({100 - _PR_DAMP} * CAST({_PR_SCALE} AS BIGINT)) // (100 * n) FROM n)"
    steps = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        steps.append(
            f"r{i} AS (SELECT e.v AS node, {base} + CAST(SUM((r.r * {_PR_DAMP} * e.w)"
            f" // (100 * e.outw)) AS BIGINT) AS r"
            f" FROM e JOIN {prev} r ON e.u = r.node GROUP BY 1)"
        )
        prev = f"r{i}"
    steps_sql = ",\n    ".join(steps)
    return f"""
    WITH raw AS (
      SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
             's' || CAST(l_suppkey AS VARCHAR) AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2),
    sym AS (SELECT src AS u, dst AS v, w FROM raw
            UNION ALL
            SELECT dst AS u, src AS v, w FROM raw),
    ow AS (SELECT u, CAST(SUM(w) AS BIGINT) AS outw FROM sym GROUP BY 1),
    e AS (SELECT sym.u, sym.v, sym.w, ow.outw FROM sym JOIN ow USING (u)),
    n AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS n FROM sym),
    r0 AS (SELECT u AS node,
                  (SELECT CAST({_PR_SCALE} AS BIGINT) // n FROM n) AS r
           FROM (SELECT DISTINCT u FROM sym)),
    {steps_sql}
    SELECT node, r AS rank_e12,
           round(CAST(r AS DOUBLE) / {_PR_SCALE}.0, 9) + 0.0 AS rank
    FROM {prev}
    ORDER BY r DESC, node
    LIMIT {_PR_TOPK}
    """


_TRI_ORACLE = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS deg
            FROM (SELECT a AS n FROM und UNION ALL SELECT b AS n FROM und)
            GROUP BY 1),
    o AS (SELECT CASE WHEN x.deg <= y.deg THEN und.a ELSE und.b END AS s,
                 CASE WHEN x.deg <= y.deg THEN und.b ELSE und.a END AS t
          FROM und JOIN deg x ON x.n = und.a JOIN deg y ON y.n = und.b),
    tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM (SELECT e1.s AS x, e2.t AS z
                  FROM o e1 JOIN o e2 ON e1.t = e2.s) w
            JOIN o c ON c.s = w.x AND c.t = w.z),
    base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                    CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
             FROM deg),
    ecnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM und)
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CASE WHEN n_wedges = 0 THEN 0.0
                ELSE round(3.0 * CAST(n_triangles AS DOUBLE)
                           / CAST(n_wedges AS DOUBLE), 9) + 0.0
           END AS global_clustering
    FROM base CROSS JOIN ecnt CROSS JOIN tri
    """


@query(
    "graph_triangle_count",
    oracle=_TRI_ORACLE,
    tags=("graph", "triangle", "clustering"),
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle census of the part co-occurrence graph (parts joined
    by appearing in the same order) — nodes, edges, wedges, triangles and
    the global clustering coefficient 3·T/W in one row. Co-occurrence
    triangles are the standard community-density signal for corpus/link
    graphs (e.g. pruning auto-generated link farms whose clustering is
    near 0 or near 1); the trade tables stand in for the link graph the
    same way they do for [q:graph_pagerank_topk].

    Like PageRank and connected components this is engine-completeness
    work past the reference surface — its only loop is the per-document
    map pipeline (SURVEY §2.2), with no graph operator anywhere.

    All four counts are BIGINT and the clustering coefficient is one
    double division rounded to 9dp, so cross-engine hash parity is exact.
    See operators/graph.py::triangle_stats for the degree-ordered
    orientation that bounds the wedge join's fan-out by the oriented
    out-degree (≤ √(2|E|)) — the "curse of the last reducer" fix that
    makes the plan survive heavy-hitter nodes at 100 TB."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    pairs = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
    )
    stats = triangle_stats(pairs)
    return stats.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.expr(
            "CASE WHEN n_wedges = 0 THEN 0.0 "
            "ELSE round(3.0 * CAST(n_triangles AS DOUBLE) "
            "/ CAST(n_wedges AS DOUBLE), 9) + 0.0 END"
        ).alias("global_clustering"),
    )


@query(
    "graph_pagerank_topk",
    oracle=_pr_oracle(),
    tags=("graph", "iterative", "pagerank"),
)
def q_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 nodes of the customer↔supplier trade graph by 5-iteration
    weighted PageRank (damping 0.85). Edges: one undirected edge per
    (customer, supplier) pair that shares a line item, weighted by how
    many — the multi-edge aggregation happens BEFORE the operator (its
    documented overflow contract). See operators/graph.py::pagerank for
    the all-integer determinism and Pregel scale-shape notes; the one
    engine-side divergence risk (SUM of BIGINT widening to HUGEINT in
    DuckDB) is pinned back to BIGINT on both sides.

    Scale shape: edge derivation is one fact-table groupBy; each of the 5
    iterations is one O(|E|) equi-join + one map-side-combinable
    groupBy(dst) — the checkpointed edge list is scanned per round, never
    rebuilt; N and the teleport base ride 1-row broadcasts. At 100 TB
    parallelism is |V| hash partitions per round, the GraphX/Pregel
    communication pattern on DataFrames."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    ranks = pagerank(
        edges, iters=_PR_ITERS, damping_pct=_PR_DAMP, scale=_PR_SCALE
    )
    return (
        ranks.orderBy(F.desc("rank_e12"), F.asc("node"))
        .limit(_PR_TOPK)
        .select(
            "node",
            "rank_e12",
            (
                F.round(F.col("rank_e12").cast("double") / F.lit(float(_PR_SCALE)), 9)
                + F.lit(0.0)
            ).alias("rank"),
        )
    )

"""Vector-corpus operators round 7b: per-source embedding-centroid drift
and MMR-diversified retrieval.

Two gaps between the suite's similarity search (top-k / IVF / LSH in
plans/llm.py) and its corpus monitoring (drift/scorecards): a MONITOR for
the embedding space itself (are a feed's vectors moving? spreading?), and
the standard re-ranking step between "top-k most similar" and "what a RAG
pipeline actually returns" (maximal marginal relevance — Carbonell &
Goldstein 1998).

Determinism: centroid statistics are computed in exact integer micro-units
(floor(v·1e6) — the float-accumulation rule: every served mean comes from
exact integer sums, one final double division); every cosine is the
in-order left fold shared with the similarity family, rounded to the 6-dp
grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceindex_demo_spark.functions import similarity as S
from mapreduceindex_demo_spark.plans.llm import _duck_dot
from mapreduceindex_demo_spark.plans.registry import query
from mapreduceindex_demo_spark.session import load_table

_DIM = 64  # embedding dimensionality (TESTDATA.md; plane_weight_expr twin)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "embedding_source_centroids",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee
               FROM embeddings),
    j AS (SELECT d.source, e.ee
          FROM e JOIN documents d ON d.doc_id = e.vec_id),
    el AS (SELECT source,
             unnest(range(1, len(ee) + 1)) AS idx,
             CAST(floor(unnest(ee) * 1000000) AS BIGINT) AS xm
           FROM j),
    g AS (SELECT source, idx, SUM(xm) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM el GROUP BY 1, 2),
    cent AS (SELECT source, SUM(ABS(s)) AS l1num, MAX(n) AS n
             FROM g GROUP BY 1),
    dev AS (SELECT el.source, ABS(el.xm * g.n - g.s) AS dv
            FROM el JOIN g ON el.source = g.source AND el.idx = g.idx),
    disp AS (SELECT source, SUM(dv) AS devsum FROM dev GROUP BY 1)
    SELECT c.source, c.n AS n_vecs,
           round(c.l1num / (c.n * 1000000.0), 6) + 0.0 AS centroid_l1,
           round(d.devsum
                 / CAST(c.n * c.n * {_DIM} * 1000000 AS DOUBLE), 6) + 0.0
             AS mean_abs_dispersion
    FROM cent c JOIN disp d USING (source)
    """,
    tags=("llm", "embedding", "monitoring", "drift"),
)
def q_embedding_source_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: per source, the centroid's L1 mass
    and the corpus's mean absolute dispersion around it — the vector twin
    of [q:text_unigram_drift] (token space) and the feed-health number a
    retrieval team tracks when an upstream embedder or corpus shifts.

    The float-accumulation rule applied end-to-end: components are
    floored to integer micro-units at the scan (floor(v*1e6) — floor, not
    round, so no engine rounding-mode boundary exists), every sum is an
    exact bigint (per-dimension Σx, and Σ|x·n − Σx| for the dispersion —
    the |n·x_i − S| trick keeps deviation-from-mean in pure integers
    without materializing a float mean), and each served number is ONE
    double division rounded to 6 dp. No AVG(double) anywhere.

    Scale shape: posexplode → per-(source, dim) combiner groupBy (the
    shuffle is O(|sources|·dim), not O(rows)); the second pass re-scans
    the exploded stream and equi-joins the |sources|·dim statistics row
    set — broadcast at any real size; final per-source fold. Two linear
    passes, zero UDFs. Integer headroom: |x·n| < 2^63 up to n ≈ 3e13
    vectors per source at |v| ≤ 0.3 — beyond any per-source corpus."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ee")
    )
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    el = (
        e.join(d, "vec_id")
        .select("source", F.posexplode("ee").alias("idx", "v"))
        .select(
            "source",
            "idx",
            F.floor(F.col("v") * 1000000).cast("long").alias("xm"),
        )
    )
    g = el.groupBy("source", "idx").agg(
        F.sum("xm").alias("s"), F.count(F.lit(1)).cast("long").alias("n")
    )
    cent = g.groupBy("source").agg(
        F.sum(F.abs("s")).alias("l1num"), F.max("n").alias("n")
    )
    dev = el.join(F.broadcast(g), ["source", "idx"]).select(
        "source", F.abs(F.col("xm") * F.col("n") - F.col("s")).alias("dv")
    )
    disp = dev.groupBy("source").agg(F.sum("dv").alias("devsum"))
    return cent.join(disp, "source").select(
        "source",
        F.col("n").alias("n_vecs"),
        (
            F.round(F.col("l1num") / (F.col("n") * F.lit(1000000.0)), 6)
            + F.lit(0.0)
        ).alias("centroid_l1"),
        (
            F.round(
                F.col("devsum")
                / (F.col("n") * F.col("n") * F.lit(_DIM) * F.lit(1000000))
                .cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("mean_abs_dispersion"),
    )


_MMR_LAMBDA = 0.7
_MMR_K = 5
_MMR_POOL = 20


def _mmr_oracle() -> str:
    """Build the fixed-k greedy MMR as chained CTEs (k is a compile-time
    constant, so the 'iteration' unrolls into k-1 pick CTEs — no recursive
    CTE needed, and the tie-break/rounding at every step is explicit)."""
    cos = (
        f"round({_duck_dot('a.ee', 'b.ee')} / "
        f"(sqrt({_duck_dot('a.ee', 'a.ee')}) * "
        f"sqrt({_duck_dot('b.ee', 'b.ee')})), 6) + 0.0"
    )
    sql = f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
               WHERE vec_id = 0),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee FROM embeddings
          WHERE vec_id <> 0),
    cand AS (SELECT vec_id, ee,
               round({_duck_dot('ee', 'qe')}
                     / (sqrt({_duck_dot('ee', 'ee')})
                        * sqrt({_duck_dot('qe', 'qe')})), 6) + 0.0 AS rel
             FROM e, q ORDER BY rel DESC, vec_id LIMIT {_MMR_POOL}),
    p AS (SELECT a.vec_id AS a, b.vec_id AS b, {cos} AS sim
          FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
    s1 AS (SELECT vec_id, rel AS score FROM cand
           ORDER BY rel DESC, vec_id LIMIT 1),
    pk1 AS (SELECT vec_id FROM s1)"""
    for t in range(2, _MMR_K + 1):
        sql += f""",
    r{t} AS (SELECT c.vec_id,
               round({_MMR_LAMBDA} * c.rel
                     - {round(1 - _MMR_LAMBDA, 6)} * MAX(p.sim), 6) + 0.0
                 AS score
             FROM cand c JOIN p ON p.a = c.vec_id
             WHERE p.b IN (SELECT vec_id FROM pk{t - 1})
               AND c.vec_id NOT IN (SELECT vec_id FROM pk{t - 1})
             GROUP BY c.vec_id, c.rel),
    s{t} AS (SELECT vec_id, score FROM r{t}
             ORDER BY score DESC, vec_id LIMIT 1),
    pk{t} AS (SELECT vec_id FROM pk{t - 1}
              UNION ALL SELECT vec_id FROM s{t})"""
    sql += "\n    SELECT 1 AS step, vec_id, score FROM s1"
    for t in range(2, _MMR_K + 1):
        sql += f"\n    UNION ALL SELECT {t}, vec_id, score FROM s{t}"
    return sql


@query(
    "similarity_mmr_rerank",
    oracle=_mmr_oracle(),
    tags=("llm", "similarity", "rerank", "mmr"),
)
def q_similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-k (Carbonell & Goldstein 1998): greedily pick
    k=5 results from the top-20 cosine candidate pool, each step taking
    argmax of lambda*relevance - (1-lambda)*max-similarity-to-already-
    picked — the standard de-redundancy re-rank between raw similarity
    ([q:similarity_topk_cosine]) and what a retrieval pipeline serves.
    Returns (step, vec_id, score-at-selection).

    Greedy selection is inherently sequential in k, so the plan is k-1
    chained select-join-argmax stages over the CANDIDATE table — never
    over the corpus. The corpus contributes exactly one top-k heap pass
    (the candidate pool, cached: 20 rows); pool pairwise sims are a
    20x20 nested-loop join; each pick stage is an anti-join + max-agg +
    1-row TakeOrdered on <=20 rows. Every stage is lazy DataFrame
    composition — no driver .collect() feeds any step, so the whole
    greedy chain is one Catalyst plan. At 100 TB only the pool pass
    scales with data; the re-rank is O(pool^2) regardless of corpus.

    Determinism: pool membership has the (rel DESC, vec_id) total order;
    every cosine is the shared in-order fold on the 6-dp grid; each
    step's argmax tie-breaks on vec_id; lambda arithmetic happens on
    already-rounded values identically in both engines."""
    e = _t(spark, sf_dir, "embeddings")
    qv = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qe")
    )
    cand = (
        e.where(F.col("vec_id") != 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("ee"))
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "ee", S.cosine(F.col("ee"), F.col("qe")).alias("rel"))
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(_MMR_POOL)
    ).cache()
    a = cand.select(F.col("vec_id").alias("a"), F.col("ee").alias("ea"))
    b = cand.select(F.col("vec_id").alias("b"), F.col("ee").alias("eb"))
    pairs = a.join(b, F.col("a") != F.col("b")).select(
        "a", "b", S.cosine(F.col("ea"), F.col("eb")).alias("sim")
    )
    sel = (
        cand.orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(1)
        .select(
            F.lit(1).alias("step"), "vec_id", F.col("rel").alias("score")
        )
    )
    for step in range(2, _MMR_K + 1):
        picked = sel.select(F.col("vec_id").alias("b"))
        ms = pairs.join(picked, "b").groupBy("a").agg(
            F.max("sim").alias("maxsim")
        )
        scored = (
            cand.join(sel.select("vec_id"), "vec_id", "anti")
            .join(ms, F.col("vec_id") == F.col("a"))
            .select(
                "vec_id",
                (
                    F.round(
                        F.lit(_MMR_LAMBDA) * F.col("rel")
                        - F.lit(round(1 - _MMR_LAMBDA, 6)) * F.col("maxsim"),
                        6,
                    )
                    + F.lit(0.0)
                ).alias("score"),
            )
        )
        pick = (
            scored.orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(1)
            .select(F.lit(step).alias("step"), "vec_id", "score")
        )
        sel = sel.unionByName(pick)
    return sel

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

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
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
        # persist each step's selection (r16): every later step references
        # ``sel`` TWICE (the anti-join and the picked-set join), so the
        # unpersisted chain doubled its subtree count per step — 2^(k-1)
        # physical instantiations of the early stages (plan-visible as ~80
        # exchanges for k=5). The cached frame is <= k rows; with it each
        # step materializes once and the chain is linear in k. Still zero
        # driver collects — the greedy chain remains one lazy plan.
        sel = sel.unionByName(pick).persist(StorageLevel.MEMORY_ONLY)
    return sel


# ==========================================================================
# Johnson-Lindenstrauss random projection (dimensionality reduction)
# ==========================================================================

_PROJ_DIMS = 8  # projected dimensionality (reuses the LSH plane family)
_PROJ_K = 20  # recall evaluated at top-k


def _proj_oracle() -> str:
    from mapreduceindex_demo_spark.plans.llm import _duck_plane_dot

    pv = (
        "["
        + ", ".join(_duck_plane_dot("ee", j) for j in range(_PROJ_DIMS))
        + "]"
    )
    pq = (
        "["
        + ", ".join(_duck_plane_dot("qe", j) for j in range(_PROJ_DIMS))
        + "]"
    )
    cos = "round({d} / (sqrt({da}) * sqrt({db})), 6) + 0.0"
    return f"""
    WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee
                FROM embeddings),
    corpus AS (SELECT * FROM e0 WHERE vec_id <> 0),
    q AS (SELECT ee AS qe FROM e0 WHERE vec_id = 0),
    exact AS (SELECT c.vec_id FROM corpus c CROSS JOIN q
      ORDER BY {cos.format(d=_duck_dot('c.ee', 'qe'), da=_duck_dot('c.ee', 'c.ee'), db=_duck_dot('qe', 'qe'))} DESC, vec_id
      LIMIT {_PROJ_K}),
    pj AS (SELECT vec_id, {pv} AS pv FROM corpus),
    pqt AS (SELECT {pq} AS pqv FROM q),
    proj AS (SELECT p.vec_id FROM pj p CROSS JOIN pqt
      ORDER BY {cos.format(d=_duck_dot('p.pv', 'pqv'), da=_duck_dot('p.pv', 'p.pv'), db=_duck_dot('pqv', 'pqv'))} DESC, vec_id
      LIMIT {_PROJ_K}),
    ov AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap
           FROM exact JOIN proj USING (vec_id))
    SELECT n_overlap,
           round(CAST(n_overlap AS DOUBLE) / {_PROJ_K}.0, 6) + 0.0
             AS recall_at_{_PROJ_K},
           CAST({_PROJ_DIMS} AS INT) AS proj_dims
    FROM ov
    """


@query(
    "similarity_projection_recall",
    oracle=_proj_oracle(),
    tags=("llm", "similarity", "projection", "contract"),
)
def q_projection_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection as a retrieval index, with
    its quality contract measured in-plan: every vector is projected
    64 → 8 dims through the engine's deterministic integer hyperplane
    family (the SAME planes whose sign bits drive LSH bucketing — LSH
    keeps 1 bit per plane, the projection keeps the full dot value), and
    the query reports top-20 recall of projected-space cosine against
    exact cosine. This is the third member of the approximate-operator
    contract family ([q:similarity_ivf_recall] for IVF,
    [q:dedup_lsh_recall_contract] for MinHash bands): an 8x cheaper
    index ships WITH the number that says what the compression costs.

    Scale shape: projection is a zero-shuffle scan expression (8 in-order
    fold dots per vector, whole-stage codegen — at 100 TB you materialize
    the 8-dim column once and retrieval scans 1/8 the bytes); both top-k
    sides are broadcast-query TakeOrdered heap passes; the verdict joins
    two 20-row frames. Determinism: integer plane weights, in-order fold
    dots, 6-dp rounded cosines, vec_id tiebreaks."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ee")
    )
    corpus = e.where(F.col("vec_id") != 0)
    qv = e.where(F.col("vec_id") == 0).select(F.col("ee").alias("qe"))

    def proj(col: str) -> F.Column:
        return F.array(
            *[
                S.dot_fold(F.col(col), F.expr(S.plane_weight_expr(j)))
                for j in range(_PROJ_DIMS)
            ]
        )

    exact = (
        corpus.crossJoin(F.broadcast(qv))
        .select("vec_id", S.cosine(F.col("ee"), F.col("qe")).alias("rel"))
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(_PROJ_K)
        .select("vec_id")
    )
    pq = e.where(F.col("vec_id") == 0).select(proj("ee").alias("pq"))
    projtop = (
        corpus.select("vec_id", proj("ee").alias("pv"))
        .crossJoin(F.broadcast(pq))
        .select("vec_id", S.cosine(F.col("pv"), F.col("pq")).alias("relp"))
        .orderBy(F.desc("relp"), F.asc("vec_id"))
        .limit(_PROJ_K)
        .select("vec_id")
    )
    ov = exact.join(projtop, "vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap")
    )
    return ov.select(
        "n_overlap",
        (
            F.round(F.col("n_overlap").cast("double") / F.lit(float(_PROJ_K)), 6)
            + F.lit(0.0)
        ).alias(f"recall_at_{_PROJ_K}"),
        F.lit(_PROJ_DIMS).cast("int").alias("proj_dims"),
    )


# ==========================================================================
# Product quantization (PQ) + asymmetric distance computation (ADC)
# ==========================================================================

_PQ_M = 4  # subspaces (64 dims → 4 × 16)
_PQ_SUB = 16  # dims per subspace
_PQ_K = 4  # centroids per subspace codebook
_PQ_SAMPLE = 256  # codebooks train on a bounded sample (production practice)
_PQ_TOPK = 5


def _duck_sqdist_micro(a: str, b: str) -> str:
    """floor(1e6 · Σ (a[i]−b[i])²) as BIGINT — the in-order fold squared-L2
    in exact micro-units (mirrors Spark's aggregate(zip_with(..)))."""
    return (
        f"CAST(floor(1000000 * list_reduce(list_transform("
        f"range(1, {_PQ_SUB} + 1), i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), "
        f"(x, y) -> x + y)) AS BIGINT)"
    )


def _pq_oracle() -> str:
    subs = " UNION ALL ".join(
        f"SELECT vec_id, {s} AS s, ee[{s * _PQ_SUB + 1}:{(s + 1) * _PQ_SUB}] AS sv"
        f" FROM e0"
        for s in range(_PQ_M)
    )
    d = _duck_sqdist_micro("sub.sv", "c0.cv")
    d1 = _duck_sqdist_micro("sub.sv", "c1.cv")
    dq = _duck_sqdist_micro("qs.sv", "c1.cv")
    return f"""
    WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee
                FROM embeddings),
    sub AS ({subs}),
    c0 AS (SELECT s, vec_id AS cid, sv AS cv FROM sub
           WHERE vec_id BETWEEN 1 AND {_PQ_K}),
    a1 AS (SELECT sub.vec_id, sub.s, sub.sv, c0.cid, {d} AS dm
           FROM sub JOIN c0 ON sub.s = c0.s
           WHERE sub.vec_id BETWEEN 1 AND {_PQ_SAMPLE}),
    b1 AS (SELECT * FROM (SELECT *, row_number()
        OVER (PARTITION BY vec_id, s ORDER BY dm, cid) AS rn FROM a1)
      WHERE rn = 1),
    g1 AS (SELECT s, cid, list(sv ORDER BY vec_id) AS vs
           FROM b1 GROUP BY s, cid),
    c1 AS (SELECT s, cid, list_transform(range(1, {_PQ_SUB} + 1),
        d -> round(list_reduce(list_transform(vs, v -> v[d]), (x, y) -> x + y)
             / len(vs), 6) + 0.0) AS cv
      FROM g1),
    codes AS (SELECT vec_id, s, cid FROM (
        SELECT sub.vec_id, sub.s, c1.cid, row_number()
          OVER (PARTITION BY sub.vec_id, sub.s ORDER BY {d1}, c1.cid) AS rn
        FROM sub JOIN c1 ON sub.s = c1.s
        WHERE sub.vec_id <> 0)
      WHERE rn = 1),
    dtab AS (SELECT qs.s, c1.cid, {dq} AS dm
             FROM (SELECT * FROM sub WHERE vec_id = 0) qs
             JOIN c1 ON qs.s = c1.s),
    adc AS (SELECT codes.vec_id, SUM(dtab.dm) AS micro
            FROM codes JOIN dtab ON codes.s = dtab.s AND codes.cid = dtab.cid
            GROUP BY codes.vec_id)
    SELECT vec_id, round(CAST(micro AS DOUBLE) / 1000000.0, 6) + 0.0
             AS approx_dist
    FROM adc ORDER BY micro, vec_id LIMIT {_PQ_TOPK}
    """


@query(
    "similarity_pq_adc_ann",
    oracle=_pq_oracle(),
    tags=("llm", "similarity", "pq", "ann"),
)
def q_pq_adc_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (Jégou et al. 2011) — the third ANN index beside IVF (cell pruning,
    [q:similarity_ivf_ann]) and LSH (bucket pruning,
    [q:similarity_lsh_ann]); PQ instead COMPRESSES: each vector's four
    16-dim subvectors quantize to one codebook id each (64 doubles →
    4 small codes), and query distance is a table lookup — squared-L2
    decomposes per subspace, ‖q−x‖² ≈ Σ_s ‖q_s − c_code(x,s)‖², so
    ranking needs only the m×k query-to-centroid table (ADC), never the
    original vectors. Returns the top-5 by approximate distance.

    Determinism end-to-end in INTEGERS: every subspace distance is the
    in-order fold squared-L2 floored to exact micro-units (bigint), so
    codebook assignment (argmin dm, tie cid asc), the ADC table, and the
    Σ_s accumulation are all exact integer arithmetic — no float
    summation order anywhere after the fold; the one served double is
    the final micro→unit division rounded to 6 dp. Codebook training
    (1 Lloyd pass per subspace over a bounded 256-vector sample, seeded
    by the first k corpus subvectors) re-centers via the 6-dp-grid mean,
    the same order-free convention the IVF quantizer proved.

    Scale shape: training touches only the bounded sample (the
    production practice — FAISS trains PQ codebooks on ~100k samples
    regardless of corpus size); coding the corpus is one broadcast of
    the m×k codebook + a map-side-combinable (vec_id, s) argmin
    (m·k = 16 candidate rows combine to m per vector before the
    exchange); the ADC ranking joins the n·m code rows to the broadcast
    m×k lookup table and sums per vector — linear passes, zero UDFs,
    and the index the query scans is the CODES table (4 bytes/vector),
    not the 512-byte vectors: a 128x scan-volume reduction at 100 TB."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ee")
    )
    codes, dtab = _pq_codes_and_dtab(e)
    adc = (
        codes.join(F.broadcast(dtab), ["s", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("dm").alias("micro"))
    )
    return (
        adc.orderBy(F.asc("micro"), F.asc("vec_id"))
        .limit(_PQ_TOPK)
        .select(
            "vec_id",
            (
                F.round(F.col("micro").cast("double") / F.lit(1000000.0), 6)
                + F.lit(0.0)
            ).alias("approx_dist"),
        )
    )


def _sqdist_micro(a: F.Column, b: F.Column) -> F.Column:
    """floor(1e6 · Σ (a[i]−b[i])²) as bigint — the in-order fold squared-L2
    in exact micro-units (the Spark twin of _duck_sqdist_micro)."""
    return F.floor(
        F.lit(1000000)
        * F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    ).cast("long")


def _pq_codes_and_dtab(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The PQ index pieces shared by [q:similarity_pq_adc_ann] (flat ADC
    ranking) and [q:similarity_ivf_pq_ann] (cell-pruned ADC ranking):
    train the per-subspace codebooks on the bounded sample (seeds = first
    k subvectors, one Lloyd pass, 6-dp-grid re-center), then return

    - ``codes``: (vec_id, s, cid) — every corpus vector's per-subspace
      code (the 4-byte/vector index artifact);
    - ``dtab``: (s, cid, dm) — the query vector's m×k ADC lookup table,
      every entry an exact micro-unit bigint.
    """
    from pyspark.sql import Window

    sub = e.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[F.slice("ee", s * _PQ_SUB + 1, _PQ_SUB) for s in range(_PQ_M)]
            )
        ).alias("s", "sv"),
    )
    seeds = sub.where(F.col("vec_id").between(1, _PQ_K)).select(
        "s", F.col("vec_id").alias("cid"), F.col("sv").alias("cv")
    )
    sample = sub.where(F.col("vec_id").between(1, _PQ_SAMPLE))
    w = Window.partitionBy("vec_id", "s").orderBy("dm", "cid")
    assigned = (
        sample.join(F.broadcast(seeds), "s")
        .select(
            "vec_id", "s", "sv", "cid",
            _sqdist_micro(F.col("sv"), F.col("cv")).alias("dm"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    codebook = (
        assigned.select("s", "cid", F.posexplode("sv").alias("pos", "v"))
        .groupBy("s", "cid", "pos")
        .agg((F.round(F.avg("v"), 6) + F.lit(0.0)).alias("cv1"))
        .groupBy("s", "cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv1"))).alias("m"))
        .select("s", "cid", F.expr("transform(m, x -> x.cv1)").alias("cv"))
    )
    codes = (
        sub.where(F.col("vec_id") != 0)
        .join(F.broadcast(codebook), "s")
        .select(
            "vec_id", "s", "cid",
            _sqdist_micro(F.col("sv"), F.col("cv")).alias("dm"),
        )
        .groupBy("vec_id", "s")
        .agg(F.min(F.struct("dm", "cid")).getField("cid").alias("cid"))
    )
    dtab = (
        sub.where(F.col("vec_id") == 0)
        .join(F.broadcast(codebook), "s")
        .select("s", "cid", _sqdist_micro(F.col("sv"), F.col("cv")).alias("dm"))
    )
    return codes, dtab


# ==========================================================================
# IVF-PQ: coarse cell pruning × product-quantized ADC ranking (FAISS
# IndexIVFPQ shape, by_residual=false)
# ==========================================================================


def _ivf_pq_oracle() -> str:
    from mapreduceindex_demo_spark.plans.llm import (
        _IVF_CENTROIDS,
        _IVF_NPROBE,
        _duck_ivf_iter,
    )

    subs = " UNION ALL ".join(
        f"SELECT vec_id, {s} AS s, ee[{s * _PQ_SUB + 1}:{(s + 1) * _PQ_SUB}] AS sv"
        f" FROM e0"
        for s in range(_PQ_M)
    )
    d = _duck_sqdist_micro("ps.sv", "pc0.cv")
    d1 = _duck_sqdist_micro("ps.sv", "pc1.cv")
    dq = _duck_sqdist_micro("qs.sv", "pc1.cv")
    return f"""
    WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee
                FROM embeddings),
    corpus AS (SELECT * FROM e0 WHERE vec_id <> 0),
    c0 AS (SELECT vec_id AS cid, ee AS ce FROM corpus
           WHERE vec_id BETWEEN 1 AND {_IVF_CENTROIDS}),
    {_duck_ivf_iter(1, 'c0')},
    {_duck_ivf_iter(2, 'c1')},
    sims AS (SELECT e0.vec_id, e0.ee, c2.cid,
      round({_duck_dot('ee', 'ce')}
            / (sqrt({_duck_dot('ee', 'ee')}) * sqrt({_duck_dot('ce', 'ce')})), 6)
        + 0.0 AS csim
      FROM e0 CROSS JOIN c2),
    ranked AS (SELECT *, row_number()
        OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn FROM sims),
    probes AS (SELECT cid AS pcid FROM ranked
               WHERE vec_id = 0 AND rn <= {_IVF_NPROBE}),
    assign AS (SELECT vec_id, cid AS ccid FROM ranked
               WHERE vec_id <> 0 AND rn = 1),
    ps AS ({subs}),
    pc0 AS (SELECT s, vec_id AS cid, sv AS cv FROM ps
            WHERE vec_id BETWEEN 1 AND {_PQ_K}),
    pa1 AS (SELECT ps.vec_id, ps.s, ps.sv, pc0.cid, {d} AS dm
            FROM ps JOIN pc0 ON ps.s = pc0.s
            WHERE ps.vec_id BETWEEN 1 AND {_PQ_SAMPLE}),
    pb1 AS (SELECT * FROM (SELECT *, row_number()
        OVER (PARTITION BY vec_id, s ORDER BY dm, cid) AS rn FROM pa1)
      WHERE rn = 1),
    pg1 AS (SELECT s, cid, list(sv ORDER BY vec_id) AS vs
            FROM pb1 GROUP BY s, cid),
    pc1 AS (SELECT s, cid, list_transform(range(1, {_PQ_SUB} + 1),
        d -> round(list_reduce(list_transform(vs, v -> v[d]), (x, y) -> x + y)
             / len(vs), 6) + 0.0) AS cv
      FROM pg1),
    codes AS (SELECT vec_id, s, cid FROM (
        SELECT ps.vec_id, ps.s, pc1.cid, row_number()
          OVER (PARTITION BY ps.vec_id, ps.s ORDER BY {d1}, pc1.cid) AS rn
        FROM ps JOIN pc1 ON ps.s = pc1.s
        WHERE ps.vec_id <> 0)
      WHERE rn = 1),
    dtab AS (SELECT qs.s, pc1.cid, {dq} AS dm
             FROM (SELECT * FROM ps WHERE vec_id = 0) qs
             JOIN pc1 ON qs.s = pc1.s),
    cand AS (SELECT codes.vec_id, codes.s, codes.cid
             FROM codes JOIN assign USING (vec_id)
             JOIN probes ON assign.ccid = probes.pcid),
    adc AS (SELECT cand.vec_id, CAST(SUM(dtab.dm) AS BIGINT) AS micro
            FROM cand JOIN dtab ON cand.s = dtab.s AND cand.cid = dtab.cid
            GROUP BY cand.vec_id)
    SELECT vec_id, round(CAST(micro AS DOUBLE) / 1000000.0, 6) + 0.0
             AS approx_dist
    FROM adc ORDER BY micro, vec_id LIMIT {_PQ_TOPK}
    """


@query(
    "similarity_ivf_pq_ann",
    oracle=_ivf_pq_oracle(),
    tags=("llm", "similarity", "ivf", "pq", "ann"),
)
def q_ivf_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN — the production composition (FAISS IndexIVFPQ,
    by_residual=false): the trained coarse quantizer of
    [q:similarity_ivf_ann] prunes the corpus to the query's nprobe=2
    nearest cells, and ranking inside the probed cells is the
    [q:similarity_pq_adc_ann] lookup-table sum over the 4-byte/vector
    codes — so the serving path touches nprobe/k of the CODES table and
    never a raw vector. This is the fourth ANN index and the one real
    systems deploy at billion scale: IVF bounds the scan, PQ bounds the
    bytes; both quantizers train on bounded samples, both ranking
    arithmetic paths are exact integer micro-units.

    Scale shape: coarse probe = one broadcast of k trained centroids +
    an equi-join on cell id (the IVF contract); PQ ranking = the
    candidate-pruned codes join the broadcast m×k table (16 rows) and
    sum per vector — the candidate set carries NO broadcast hint (it
    grows as n·nprobe/k; the round-6 hint-free policy), while the
    bounded dtab does. Composition reuses _pq_codes_and_dtab verbatim —
    index artifacts are shared between the flat and the cell-pruned
    server, exactly how a deployment amortizes one build across
    serving strategies."""
    from mapreduceindex_demo_spark.plans.llm import (
        _IVF_NPROBE,
        _ivf_ranked_assignments,
    )

    e, ranked = _ivf_ranked_assignments(spark, sf_dir)
    probes = ranked.where(
        (F.col("vec_id") == 0) & (F.col("rn") <= _IVF_NPROBE)
    ).select(F.col("cid").alias("pcid"))
    cand = (
        ranked.where((F.col("vec_id") != 0) & (F.col("rn") == 1))
        .join(F.broadcast(probes), F.col("cid") == F.col("pcid"))
        .select("vec_id")
    )
    codes, dtab = _pq_codes_and_dtab(e)
    adc = (
        codes.join(cand, "vec_id")
        .join(F.broadcast(dtab), ["s", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("dm").cast("long").alias("micro"))
    )
    return (
        adc.orderBy(F.asc("micro"), F.asc("vec_id"))
        .limit(_PQ_TOPK)
        .select(
            "vec_id",
            (
                F.round(F.col("micro").cast("double") / F.lit(1000000.0), 6)
                + F.lit(0.0)
            ).alias("approx_dist"),
        )
    )


# ---------------------------------------------------------------------------
# round 8b: 1-bit (sign) binarized embeddings + Hamming-distance ANN
# ---------------------------------------------------------------------------

_HAM_WORDS = _DIM // 32  # sign bits packed 32 per BIGINT word
_HAM_NQ = 5  # query vectors: vec_id < _HAM_NQ
_HAM_TOPK = 10


def _spark_pack_word(j: int) -> str:
    """Spark SQL expr packing sign bits 32j..32j+31 of ``embedding`` into a
    BIGINT (bit b set iff component > 0). Each bit is distinct so ``+`` is
    exactly bitwise OR and the word stays < 2^32 — no sign-bit hazards."""
    return (
        "aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, b) -> acc + "
        f"IF(element_at(embedding, 32 * {j} + b + 1) > 0, "
        "shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))"
    )


def _duck_pack_word(j: int) -> str:
    return (
        "CAST(list_sum(list_transform(range(0, 32), b -> CASE WHEN "
        f"embedding[32 * {j} + b + 1] > 0 THEN (CAST(1 AS BIGINT) << b) "
        "ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
    )


def _ham_oracle() -> str:
    words = ",\n        ".join(
        f"{_duck_pack_word(j)} AS w{j}" for j in range(_HAM_WORDS)
    )
    dist = " + ".join(
        f"bit_count(xor(q.qw{j}, s.w{j}))" for j in range(_HAM_WORDS)
    )
    qcols = ", ".join(f"w{j} AS qw{j}" for j in range(_HAM_WORDS))
    return f"""
    WITH sig AS (SELECT vec_id,
        {words}
      FROM embeddings),
    q AS (SELECT vec_id AS query_id, {qcols} FROM sig
          WHERE vec_id < {_HAM_NQ}),
    d AS (SELECT q.query_id, s.vec_id AS neighbor_id,
                 CAST({dist} AS BIGINT) AS hamming_dist
          FROM sig s CROSS JOIN q WHERE s.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, hamming_dist,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY hamming_dist, neighbor_id) AS BIGINT) AS rnk
    FROM d
    QUALIFY rnk <= {_HAM_TOPK}
    """


@query(
    "similarity_hamming_ann",
    oracle=_ham_oracle(),
    tags=("llm", "similarity", "hamming", "binarization", "ann"),
)
def q_similarity_hamming_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 nearest neighbors under sign-binarized Hamming distance for
    the five lowest-id query vectors — the 1-bit extreme of the quantized
    retrieval ladder the suite already climbs ([q:embedding_int8_quantization]
    8-bit, [q:similarity_pq_adc_ann] sub-byte codebooks). Sign-bit
    binarization (Charikar's SimHash applied to the identity projection)
    keeps cosine neighborhoods ~intact while shrinking vectors 32× and
    turning distance into XOR + popcount — the cheapest rerank-candidate
    generator there is, and entirely integer so cross-engine parity is
    exact (no cosine ulps anywhere).

    Scale shape: signatures are a scan-local projection (dim/32 BIGINT
    words per vector, packed by a zero-shuffle fold); the query side is
    nq=5 (`_HAM_NQ`) rows broadcast into the candidate scan, so the distance
    pass is one embarrassingly-parallel map over signatures, then a
    per-query top-k window on a (query, dist)-sorted shuffle of
    O(N·nq) SMALL rows (3 ints each — ~100× less shuffle than float
    vectors). At 100 TB: identical plan with the signature table stored
    (8 B/vector at dim 64 — RAM-resident even at 1e10 vectors), or
    bucketed multi-index Hamming (split words into bands, equi-join per
    band — the [q:similarity_lsh_ann] shape) when even one scan is too
    much. Docstring formula check: tests recompute via NumPy sign+XOR."""
    e = _t(spark, sf_dir, "embeddings")
    sig = e.select(
        "vec_id",
        *[
            F.expr(_spark_pack_word(j)).alias(f"w{j}")
            for j in range(_HAM_WORDS)
        ],
    )
    q = sig.where(F.col("vec_id") < _HAM_NQ).select(
        F.col("vec_id").alias("query_id"),
        *[F.col(f"w{j}").alias(f"qw{j}") for j in range(_HAM_WORDS)],
    )
    dist = None
    for j in range(_HAM_WORDS):
        term = F.expr(f"bit_count(qw{j} ^ w{j})")
        dist = term if dist is None else dist + term
    pairs = (
        sig.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dist.cast("long").alias("hamming_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("hamming_dist"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= _HAM_TOPK)
    )


# ---------------------------------------------------------------------------
# round 13b: k-center greedy coreset selection (farthest-point traversal)
# ---------------------------------------------------------------------------

#: coreset size served. Fixed and unrolled so both engines run the
#: identical finite selection chain; a production coreset is this loop
#: run to the budget with the same per-round cost structure.
_KC_K = 5


def _kc_duck_dist(a: str, b: str) -> str:
    """Cosine DISTANCE (1 - rounded cosine) in DuckDB — one IEEE subtract
    over the 6-dp-rounded similarity, so the value sits on the same exact
    grid in both engines."""
    return (
        f"1.0 - (round({_duck_dot(a, b)} / (sqrt({_duck_dot(a, a)})"
        f" * sqrt({_duck_dot(b, b)})), 6) + 0.0)"
    )


def _kc_duck_iter(i: int) -> str:
    """One unrolled greedy round in DuckDB SQL: every corpus vector's min
    distance to the selected set so far, then the farthest-point argmax
    with the total (mind DESC, vec_id ASC) tiebreak."""
    return f"""
    d{i} AS (SELECT e.vec_id, e.ee, MIN({_kc_duck_dist('e.ee', 'c.ee')}) AS mind
             FROM e CROSS JOIN c{i} c GROUP BY 1, 2),
    s{i + 1} AS (SELECT vec_id, ee, mind FROM d{i}
                 ORDER BY mind DESC, vec_id LIMIT 1),
    c{i + 1} AS (SELECT vec_id, ee FROM c{i}
                 UNION ALL SELECT vec_id, ee FROM s{i + 1})"""


_KC_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee
               FROM embeddings WHERE vec_id <> 0),
    s1 AS (SELECT vec_id, ee FROM e ORDER BY vec_id LIMIT 1),
    c1 AS (SELECT vec_id, ee FROM s1),
    {_kc_duck_iter(1)},
    {_kc_duck_iter(2)},
    {_kc_duck_iter(3)},
    {_kc_duck_iter(4)}
    SELECT * FROM (
      SELECT 1 AS sel_rank, vec_id, CAST(NULL AS DOUBLE) AS min_dist FROM s1
      UNION ALL SELECT 2, vec_id, mind + 0.0 FROM s2
      UNION ALL SELECT 3, vec_id, mind + 0.0 FROM s3
      UNION ALL SELECT 4, vec_id, mind + 0.0 FROM s4
      UNION ALL SELECT 5, vec_id, mind + 0.0 FROM s5)
    ORDER BY sel_rank
    """


@query(
    "curation_kcenter_coreset",
    oracle=_KC_ORACLE,
    tags=("llm", "curation", "coreset", "embedding"),
)
def q_curation_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center greedy CORESET selection — farthest-point traversal
    (Gonzalez 1985's 2-approximation, the core-set selection rule of
    Sener & Savarese, ICLR 2018): seed with the lowest-id vector, then
    ``_KC_K - 1`` times add the corpus vector FARTHEST (cosine distance)
    from the already-selected set — the diversity-maximizing draw a
    curation pipeline uses to pick a small, representative training
    subset from an embedded corpus (the selection-order complement of
    [q:similarity_mmr_rerank], which diversifies a k-row retrieval pool;
    this traverses the WHOLE corpus). Serves (sel_rank, vec_id,
    min_dist) where min_dist — NULL for the seed — is the selected
    point's distance to the prior set: the non-increasing sequence whose
    k-th value is the classic coverage-radius certificate.

    Determinism: distances are 1 − (6-dp-rounded cosine) — one IEEE
    subtract over the shared grid, so both engines order identically;
    argmax ties break on vec_id. Already-selected points re-enter each
    round with min_dist 0, so they can never win the argmax before every
    remaining point is exhausted.

    Scale shape: the running min-distance column is maintained
    INCREMENTALLY — each round touches one NEW center (a 1-row
    broadcast) and updates mind via least(), so round cost is O(n·dim),
    not O(n·i·dim), and the only ordered exchange is the TakeOrdered(1)
    heap merge; nothing ever pairs corpus vectors with each other. The
    per-round (vec_id, ee, mind) frame persists MEMORY_ONLY (evictable;
    at cluster scale this is the standard materialize-or-recompute
    choice). k rounds = k linear passes — the published algorithm's
    honest cost; there is no shuffle keyed on vec_id anywhere.

    Reference anchor: the reference engine (indexjs.go:73-191) has no
    embedding surface; this extends the LLM-pipeline curation family
    beyond reference parity."""
    from pyspark import StorageLevel

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ee")
    ).where(F.col("vec_id") != 0)

    def dist(a, b):
        return F.lit(1.0) - S.cosine(a, b)

    seed = e.orderBy("vec_id").limit(1)
    # running min-distance frame: distance of every vector to the seed
    frame = (
        e.crossJoin(F.broadcast(seed.select(F.col("ee").alias("ce"))))
        .select("vec_id", "ee", dist(F.col("ee"), F.col("ce")).alias("mind"))
        .persist(StorageLevel.MEMORY_ONLY)
    )
    picks = [
        seed.select(
            F.lit(1).alias("sel_rank"),
            "vec_id",
            F.lit(None).cast("double").alias("min_dist"),
        )
    ]
    for i in range(2, _KC_K + 1):
        nxt = frame.orderBy(F.desc("mind"), F.asc("vec_id")).limit(1)
        picks.append(
            nxt.select(
                F.lit(i).alias("sel_rank"),
                "vec_id",
                (F.col("mind") + F.lit(0.0)).alias("min_dist"),
            )
        )
        if i < _KC_K:
            frame = (
                frame.crossJoin(F.broadcast(nxt.select(F.col("ee").alias("ce"))))
                .select(
                    "vec_id",
                    "ee",
                    F.least("mind", dist(F.col("ee"), F.col("ce"))).alias("mind"),
                )
                .persist(StorageLevel.MEMORY_ONLY)
            )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionAll(p)
    return out.orderBy("sel_rank")


# ---------------------------------------------------------------------------
# round 13b: embedding anisotropy / all-but-the-top diagnostic
# ---------------------------------------------------------------------------

#: power-iteration rounds for the dominant covariance direction. Fixed and
#: unrolled; the iteration runs over the DIM x DIM covariance grid — pure
#: metadata, corpus-independent.
_ABTT_ITERS = 8
_ABTT_DIM = 64


def _abtt_duck_oracle() -> str:
    """Unrolled DuckDB power iteration. Every chained CTE is MATERIALIZED:
    DuckDB inlines CTEs by default and each round references its
    predecessor twice (the matvec and the norm's scalar subquery), so the
    un-materialized chain re-evaluates the corpus-moment scan 2^iters
    times — measured as a multi-minute hang at sf0.001 vs 0.16 s
    materialized."""
    dot = (
        "list_reduce(list_transform(range(1, len(ee) + 1), "
        "x_i -> ee[x_i] * va[x_i]), (x_a, x_b) -> x_a + x_b)"
    )
    it, prev = "", "v0"
    for t in range(1, _ABTT_ITERS + 1):
        it += f""",
    u{t} AS MATERIALIZED (SELECT i AS d, SUM(c * vd) AS u FROM c
                          JOIN {prev} ON j = d GROUP BY 1),
    v{t} AS MATERIALIZED (SELECT d, round(u / sqrt((SELECT SUM(u*u)
                          FROM u{t})), 6) + 0.0 AS vd FROM u{t})"""
        prev = f"v{t}"
    return f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ee
               FROM embeddings),
    dims AS (SELECT unnest(range(1, {_ABTT_DIM + 1})) AS d),
    mu AS MATERIALIZED (SELECT d, round(avg(ee[d]), 6) + 0.0 AS m
                        FROM e CROSS JOIN dims GROUP BY 1),
    mm AS MATERIALIZED (SELECT i.d AS i, j.d AS j,
                               round(avg(e.ee[i.d] * e.ee[j.d]), 6) + 0.0 AS mij
                        FROM e CROSS JOIN dims i CROSS JOIN dims j
                        GROUP BY 1, 2),
    c AS MATERIALIZED (SELECT i, j, round(mij - mi.m * mj.m, 6) + 0.0 AS c
                       FROM mm JOIN mu mi ON mi.d = i JOIN mu mj ON mj.d = j),
    v0 AS (SELECT d, CASE WHEN d = 1 THEN 1.0 ELSE 0.0 END AS vd FROM dims){it},
    varr AS (SELECT list(vd ORDER BY d) AS va FROM v{_ABTT_ITERS}),
    lt AS (SELECT round(SUM(c * va[i] * va[j]), 6) + 0.0 AS var_top,
                  round(SUM(CASE WHEN i = j THEN c ELSE 0.0 END), 6) + 0.0
                    AS trace_cov
           FROM c CROSS JOIN varr),
    proj AS (SELECT label, round({dot}, 6) + 0.0 AS p FROM e CROSS JOIN varr)
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           round(avg(p), 6) + 0.0 AS mean_proj_top,
           round(avg(p*p), 6) + 0.0 AS meansq_proj_top,
           var_top, trace_cov,
           round(var_top / trace_cov, 6) + 0.0 AS var_share_top
    FROM proj CROSS JOIN lt GROUP BY label, var_top, trace_cov ORDER BY label
    """


def abtt_g6(x: float) -> float:
    """The engine-exact 6-dp grid for driver-side math — the 6-dp
    instance of the shared :func:`engine_round` HALF_UP mirror (see its
    docstring for the two measured divergence cases; generalized r15)."""
    from mapreduceindex_demo_spark.oracle_harness import engine_round

    return engine_round(x, 6)


def abtt_power_iteration(C: list, iters: int = _ABTT_ITERS) -> list:
    """Driver-side power iteration over the 6-dp covariance grid: pure
    IEEE-double Python, deterministic and engine-independent; each round
    re-rounds to the grid exactly as the oracle's SQL does (``abtt_g6``).
    Shared by the query builder and the NumPy recomputation test."""
    import math

    dim = len(C)
    v = [1.0] + [0.0] * (dim - 1)
    for _ in range(iters):
        u = [sum(C[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        nrm = math.sqrt(sum(x * x for x in u))
        v = [abtt_g6(x / nrm) for x in u]
    return v


def _abtt_moment_sums(ee_frame: DataFrame) -> DataFrame:
    """Arrow-batched partial-moment kernel: reduce each Arrow batch of
    ``ee`` vectors to ONE flat partial — dim² outer-product sums
    (``arr.T @ arr``, BLAS), dim column sums, and the batch count — then
    fold the per-batch partials with a 4161-key posexplode+groupBy-sum.
    The exchange therefore carries one row per ARROW BATCH (~10k vectors
    under the default maxRecordsPerBatch), never per-row moment cells:
    at 100 TB the shuffle is ~|batches| x 33 KB while the O(n·dim²)
    arithmetic runs vectorized executor-side. Returns the (p, s) cell
    frame; the caller collects its DIM*(DIM+1)+1 rows (corpus-independent
    bounded metadata) and re-rounds sums/count on the ``abtt_g6`` grid."""
    dim = _ABTT_DIM

    def part(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            arr = np.asarray(pdf["ee"].to_list(), dtype=np.float64)
            mom = np.concatenate(
                [(arr.T @ arr).ravel(), arr.sum(axis=0), [float(len(pdf))]]
            )
            yield pd.DataFrame({"mom": [mom.tolist()]})

    return (
        ee_frame.mapInPandas(part, schema="mom array<double>")
        .select(F.posexplode("mom").alias("p", "v"))
        .groupBy("p")
        .agg(F.sum("v").alias("s"))
    )


@query(
    "embedding_anisotropy_abtt",
    oracle=_abtt_duck_oracle(),
    tags=("llm", "embedding", "anisotropy", "abtt"),
    bench=True,  # r14: driver-tracked after the Arrow-batched respell (r13 verdict item 3)
)
def q_embedding_anisotropy_abtt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space anisotropy diagnostic — the measurement half of
    ALL-BUT-THE-TOP post-processing (Mu & Viswanath, ICLR 2018: embedding
    sets share a large common mean vector and a few dominant directions;
    removing them improves downstream similarity tasks). The operator
    computes the corpus covariance's dominant direction by power
    iteration and serves, per label stratum, the corpus-health numbers a
    retrieval pipeline monitors before/after correction: member count,
    mean and mean-square projection onto the top direction (a stratum
    whose mean projection sits far from its peers is encoding SOURCE, not
    content), plus the global top-direction variance, covariance trace,
    and variance share (the anisotropy number itself — isotropic
    embeddings put ~1/dim of variance on any direction; these synthetic
    embeddings measure ~0.027 ≈ 1.76/64).

    Execution splits by SIZE CLASS, the [q:similarity_pq_adc_ann]
    codebook precedent: the corpus-sized work is ONE Arrow-batched scan —
    ``mapInPandas`` reduces each Arrow batch to a single
    DIM*(DIM+1)+1-cell partial (one BLAS ``arr.T @ arr`` outer-product
    accumulation + column sums + the batch count), so the exchange
    carries one ~33 KB row PER BATCH, never per-vector cells — and a
    tiny posexplode+groupBy folds the per-batch partials into the 4160
    second/first-moment cells, which is then a BOUNDED-METADATA collect
    (dim²-sized, corpus-INDEPENDENT; the suite's third such site). This
    replaced the r13b per-row fused-Generate spelling (each row
    materialized its own 4160-element product array through the row
    pipeline) after that spelling measured as the suite's only
    rising-with-scale ratio (5.84x -> 7.52x at ~sf1 -> ~sf3, BASELINE.md
    r14 cell pair); the vectorized kernel moves the O(n·dim²) work into
    NumPy matmul at Arrow-batch granularity. The power iteration itself
    runs driver-side over the 6-dp grid (``abtt_power_iteration`` — pure
    IEEE doubles, deterministic, exactly what a production pipeline
    does: numpy eig on the driver after a distributed moment pass), and
    the trained direction re-enters the plan as a LITERAL array for the
    per-label projection scan. Total: two corpus passes at read
    bandwidth, zero joins, no vec_id-keyed exchange anywhere.

    Determinism/parity: every moment is rounded to the 6-dp grid before
    use (the [q:similarity_ivf_ann] n·eps argument covers the
    cross-engine — and cross-kernel: NumPy pairwise vs engine sequential
    — summation order), the grid round is ``abtt_g6``, the PROVEN mirror
    of both engines' round(x, 6) (test_abtt_g6_mirrors_engine_rounding),
    the iteration re-rounds each round, and the oracle replays the
    identical chain in SQL over MATERIALIZED CTEs (see
    ``_abtt_duck_oracle`` for why materialization is load-bearing).

    Reference anchor: the reference engine (indexjs.go:73-191) has no
    embedding surface; this extends the LLM-pipeline vector family beyond
    reference parity."""
    dim, g = _ABTT_DIM, abtt_g6
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("ee")
    )
    sums = _abtt_moment_sums(e.select("ee")).collect()
    raw = [0.0] * (dim * dim + dim + 1)
    for r in sums:
        raw[r.p] = r.s
    n = raw[dim * dim + dim]
    # cell layout: [0, dim²) second moments row-major, then dim first
    # moments, then the count; avg = sum/n re-rounded on the engine grid
    mu = [g(raw[dim * dim + i] / n) for i in range(dim)]
    M = [[g(raw[i * dim + j] / n) for j in range(dim)] for i in range(dim)]
    C = [[g(M[i][j] - mu[i] * mu[j]) for j in range(dim)] for i in range(dim)]
    v = abtt_power_iteration(C)
    var_top = g(sum(C[i][j] * v[i] * v[j] for i in range(dim) for j in range(dim)))
    trace = g(sum(C[i][i] for i in range(dim)))
    va = F.array(*[F.lit(x) for x in v])
    proj = e.select(
        "label", (F.round(S.dot_fold(F.col("ee"), va), 6) + F.lit(0.0)).alias("p")
    )
    return (
        proj.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            (F.round(F.avg("p"), 6) + F.lit(0.0)).alias("mean_proj_top"),
            (F.round(F.avg(F.col("p") * F.col("p")), 6) + F.lit(0.0)).alias(
                "meansq_proj_top"
            ),
        )
        .select(
            "label",
            "n_vecs",
            "mean_proj_top",
            "meansq_proj_top",
            F.lit(var_top).alias("var_top"),
            F.lit(trace).alias("trace_cov"),
            F.lit(g(var_top / trace)).alias("var_share_top"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# round 14: nDCG@k retrieval evaluation (graded-relevance ranking quality)
# ---------------------------------------------------------------------------

_NDCG_K = 10
#: the per-hit DCG term, spelled ONCE for both engines over integer gain
#: and rank columns (the _ZIPF_STATS shared-spelling pattern): graded
#: exponential gain (2^g - 1) discounted by log2(rank + 1), the standard
#: formulation (Burges et al. 2005 popularized; Järvelin-Kekäläinen 2002
#: define the metric family).
_NDCG_TERM_T = (
    "(pow(2.0, CAST(g AS DOUBLE)) - 1.0)"
    " / log2(CAST({r} AS DOUBLE) + 1.0)"
)
_NDCG_TERM = _NDCG_TERM_T.format(r="rn")
#: synthetic graded relevance over the integer labels: 2 = exact label
#: match, 1 = adjacent label, 0 otherwise — the grading is demo data
#: policy (real pipelines bring judgment labels); the METRIC machinery
#: is the published one.
_NDCG_GAIN = "greatest(0, 2 - abs(label - qlabel))"


def _ndcg_oracle() -> str:
    dot = _duck_dot("ee", "qe")
    return f"""
    WITH q AS (SELECT vec_id AS qid, label AS qlabel,
                      CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ee
          FROM embeddings WHERE vec_id >= 5),
    sims AS (SELECT q.qid, q.qlabel, c.vec_id, c.label,
               round({dot} / (sqrt({_duck_dot('ee', 'ee')})
                              * sqrt({_duck_dot('qe', 'qe')})), 6) + 0.0 AS cs
             FROM c CROSS JOIN q),
    graded AS (SELECT qid, vec_id, cs, {_NDCG_GAIN} AS g FROM sims),
    ranked AS (SELECT qid, g,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY cs DESC, vec_id) AS rn
               FROM graded),
    ideal AS (SELECT qid, g,
                row_number() OVER (PARTITION BY qid
                                   ORDER BY g DESC, vec_id) AS rn
              FROM graded),
    dcg AS (SELECT qid, SUM({_NDCG_TERM}) AS dcg
            FROM ranked WHERE rn <= {_NDCG_K} GROUP BY 1),
    idcg AS (SELECT qid, SUM({_NDCG_TERM}) AS idcg
             FROM ideal WHERE rn <= {_NDCG_K} GROUP BY 1)
    SELECT q.qid, q.qlabel,
           round(dcg.dcg, 6) + 0.0 AS dcg_at_10,
           round(idcg.idcg, 6) + 0.0 AS idcg_at_10,
           round(dcg.dcg / nullif(idcg.idcg, 0.0), 6) + 0.0 AS ndcg_at_10
    FROM q JOIN dcg ON dcg.qid = q.qid JOIN idcg ON idcg.qid = q.qid
    ORDER BY q.qid
    """


@query(
    "similarity_ndcg_eval",
    oracle=_ndcg_oracle(),
    tags=("llm", "similarity", "eval", "ndcg"),
)
def q_similarity_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 retrieval evaluation (Järvelin & Kekäläinen, TOIS 2002;
    exponential-gain form per Burges et al. 2005) — the GRADED-relevance
    ranking metric beside the binary reciprocal-rank harness
    ([q:similarity_label_mrr]): gains of 2/1/0 for exact/adjacent/other
    label (synthetic grading — real pipelines substitute judgment
    labels; the metric machinery is what the operator contributes),
    discounted by log2(rank+1), normalized by the ideal ordering of the
    same corpus gains. Served per eval query: DCG@10, the ideal IDCG@10,
    and their ratio — the number a retrieval team tracks when swapping
    retrievers (brute force here; the IVF/LSH/PQ variants price their
    recall loss in nDCG terms exactly as [q:similarity_ivf_recall] does
    in recall terms).

    Determinism/parity: gains are exact integers from integer labels;
    both rankings order by (rounded-6dp cosine DESC, vec_id) /
    (gain DESC, vec_id) — total orders, so ranks are bit-identical
    cross-engine; each served sum folds <= 10 terms of the ONE shared
    ``_NDCG_TERM`` spelling (log2 on the ln-parity precedent), rounded
    to the 6-dp grid; IDCG's nullif guard serves NULL in both engines
    if a query somehow had zero graded mass.

    Scale shape: the 5-query panel broadcasts against one corpus scan
    (the [q:similarity_ivf_batch] batch shape); both windows partition
    by qid (parallel, never global); the metric aggregates <= 2·10 rows
    per query. Eval-panel size is the knob at 100 TB — a sampled query
    panel, never corpus-vs-corpus.

    Reference anchor: the reference engine (indexjs.go:73-191) has no
    retrieval-eval surface; this extends the LLM-pipeline similarity
    family beyond reference parity."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("ee")
    )
    qs = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("ee").alias("qe"),
    )
    corpus = e.where(F.col("vec_id") >= 5)
    graded = corpus.crossJoin(F.broadcast(qs)).select(
        "qid",
        "qlabel",
        "vec_id",
        S.cosine(F.col("ee"), F.col("qe")).alias("cs"),
        F.expr(_NDCG_GAIN).alias("g"),
    )
    # ONE pass over the graded frame (r14 verdict item 5: the two-frame
    # spelling re-ran the corpus scan + cosine fan-out once per window):
    # both row_numbers share the qid partition key, so Catalyst plans one
    # qid exchange feeding two in-partition sorts — the corpus is scanned
    # and graded exactly once per execution (pinned by plan-shape test).
    wr = Window.partitionBy("qid").orderBy(F.desc("cs"), F.asc("vec_id"))
    wi = Window.partitionBy("qid").orderBy(F.desc("g"), F.asc("vec_id"))
    both = (
        graded.withColumn("rn", F.row_number().over(wr))
        .withColumn("ri", F.row_number().over(wi))
        .where((F.col("rn") <= _NDCG_K) | (F.col("ri") <= _NDCG_K))
        .groupBy("qid")
        .agg(
            F.sum(
                F.when(F.col("rn") <= _NDCG_K, F.expr(_NDCG_TERM))
            ).alias("dcg"),
            F.sum(
                F.when(
                    F.col("ri") <= _NDCG_K,
                    F.expr(_NDCG_TERM_T.format(r="ri")),
                )
            ).alias("idcg"),
        )
    )
    return (
        qs.select("qid", "qlabel")
        .join(both, "qid")
        .select(
            "qid",
            "qlabel",
            (F.round("dcg", 6) + F.lit(0.0)).alias("dcg_at_10"),
            (F.round("idcg", 6) + F.lit(0.0)).alias("idcg_at_10"),
            (
                F.round(
                    F.col("dcg") / F.expr("nullif(idcg, 0.0)"), 6
                )
                + F.lit(0.0)
            ).alias("ndcg_at_10"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# round 16: hard-negative mining for contrastive retrieval training
# ---------------------------------------------------------------------------

_HN_K = 5  # negatives served per query

_HARD_NEG_ORACLE = f"""
    WITH q AS (SELECT vec_id AS qid, label AS qlabel,
                      CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ee
          FROM embeddings WHERE vec_id >= 5),
    graded AS (SELECT q.qid, c.vec_id,
                 round({_duck_dot('ee', 'qe')}
                       / (sqrt({_duck_dot('ee', 'ee')})
                          * sqrt({_duck_dot('qe', 'qe')})), 6) + 0.0 AS cs,
                 {_NDCG_GAIN} AS g
               FROM c CROSS JOIN q),
    w AS (SELECT qid, vec_id, cs, g,
            MAX(CASE WHEN g > 0 THEN cs END)
              OVER (PARTITION BY qid) AS best_pos,
            row_number() OVER (PARTITION BY qid
                               ORDER BY CASE WHEN g = 0 THEN 0 ELSE 1 END,
                                        cs DESC, vec_id) AS rn
          FROM graded)
    SELECT qid,
           CAST(rn AS INT) AS rank,
           vec_id AS neg_vec_id,
           cs AS neg_score,
           round(coalesce(best_pos, -2.0), 6) + 0.0 AS best_pos_score,
           CAST(CASE WHEN cs > coalesce(best_pos, -2.0)
                THEN 1 ELSE 0 END AS INT) AS above_best_positive
    FROM w
    WHERE g = 0 AND rn <= {_HN_K}
    ORDER BY qid, rank
    """


@query(
    "similarity_hard_negatives",
    oracle=_HARD_NEG_ORACLE,
    tags=("llm", "similarity", "training", "negatives"),
)
def q_similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training (DPR —
    Karpukhin et al., EMNLP 2020 §3.2: train the bi-encoder against the
    highest-scoring NON-relevant candidates the current retriever
    returns; RocketQA — Qu et al., NAACL 2021 — adds the denoising flag:
    a "negative" outscoring every true positive is a likely false
    negative and should be audited before training on it). Over the
    nDCG panel's exact relevance contract ([q:similarity_ndcg_eval] —
    5 query vectors, graded gain 2/1/0 by label adjacency, positives =
    gain > 0): rank each query's NEGATIVES by retriever score (6-dp
    cosine) and serve the top-{_HN_K} per query with the RocketQA flag —
    the rows a contrastive-training data loader ingests.

    Determinism/parity: the ranking key is (negatives-first, 6-dp cosine
    DESC, vec_id) — a total order; the best-positive score is a MAX over
    the qid partition (order-free); the flag compares two 6-dp-rounded
    values; the no-positive edge serves the -2.0 sentinel (below any
    cosine) so the flag degrades to 1 = "nothing to beat", stated
    policy.

    Scale shape: the 5-query panel broadcasts against ONE corpus scan
    (the [q:similarity_ndcg_eval] batch shape); the negative rank and
    the best-positive max share the single qid exchange; the serve is
    <= 5x{_HN_K} rows. Panel size is the 100 TB knob — mining is
    per-query top-k against the corpus, never corpus-vs-corpus.

    Reference anchor: beyond reference parity (no retrieval surface in
    the reference); completes the retrieval-training loop beside the
    eval twins (nDCG, MRR, recall)."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("ee")
    )
    qs = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("ee").alias("qe"),
    )
    corpus = e.where(F.col("vec_id") >= 5)
    graded = corpus.crossJoin(F.broadcast(qs)).select(
        "qid",
        "vec_id",
        S.cosine(F.col("ee"), F.col("qe")).alias("cs"),
        F.expr(_NDCG_GAIN).alias("g"),
    )
    wq = Window.partitionBy("qid")
    wr = Window.partitionBy("qid").orderBy(
        F.when(F.col("g") == 0, F.lit(0)).otherwise(F.lit(1)).asc(),
        F.desc("cs"),
        F.asc("vec_id"),
    )
    w = graded.withColumn(
        "best_pos", F.max(F.when(F.col("g") > 0, F.col("cs"))).over(wq)
    ).withColumn("rn", F.row_number().over(wr))
    return (
        w.where((F.col("g") == 0) & (F.col("rn") <= _HN_K))
        .select(
            "qid",
            F.col("rn").cast("int").alias("rank"),
            F.col("vec_id").alias("neg_vec_id"),
            F.col("cs").alias("neg_score"),
            (F.round(F.coalesce(F.col("best_pos"), F.lit(-2.0)), 6) + F.lit(0.0))
            .alias("best_pos_score"),
            (F.col("cs") > F.coalesce(F.col("best_pos"), F.lit(-2.0)))
            .cast("int")
            .alias("above_best_positive"),
        )
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# round 16: Matryoshka prefix-dimension recall (adaptive-retrieval eval)
# ---------------------------------------------------------------------------

_MRL_DIMS = (8, 16, 32, 64)
_MRL_K = 10


def _duck_prefix_dot(a: str, b: str) -> str:
    """In-order left fold over the first ``dim`` coordinates (outer
    column) — the prefix twin of the full-width `_duck_dot`."""
    return (
        f"list_reduce(list_transform(range(1, dim + 1), "
        f"i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


_MATRYOSHKA_ORACLE = f"""
    WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee
          FROM embeddings WHERE vec_id >= 5),
    dims AS (SELECT * FROM (VALUES {", ".join(f"({d})" for d in _MRL_DIMS)})
             AS d(dim)),
    long AS (SELECT q.qid, c.vec_id, dims.dim,
      round({_duck_prefix_dot('ee', 'qe')}
            / (sqrt({_duck_prefix_dot('ee', 'ee')})
               * sqrt({_duck_prefix_dot('qe', 'qe')})), 6) + 0.0 AS csd
      FROM c CROSS JOIN q CROSS JOIN dims),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY qid, dim
                                            ORDER BY csd DESC, vec_id) AS rn
               FROM long),
    top AS (SELECT * FROM ranked WHERE rn <= {_MRL_K}),
    truth AS (SELECT qid, vec_id FROM top WHERE dim = {_MRL_DIMS[-1]}),
    trunc AS (SELECT * FROM top WHERE dim <> {_MRL_DIMS[-1]})
    SELECT t.qid AS qid, CAST(t.dim AS INT) AS dim,
           CAST(COUNT(tr.vec_id) AS BIGINT) AS n_overlap,
           round(COUNT(tr.vec_id) / {_MRL_K}.0, 6) + 0.0 AS recall_at_{_MRL_K}
    FROM trunc t LEFT JOIN truth tr
      ON t.qid = tr.qid AND t.vec_id = tr.vec_id
    GROUP BY t.qid, t.dim
    ORDER BY t.qid, t.dim
    """


@query(
    "similarity_matryoshka_recall",
    oracle=_MATRYOSHKA_ORACLE,
    tags=("llm", "similarity", "matryoshka", "eval", "embedding"),
)
def q_similarity_matryoshka_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka prefix-dimension retrieval recall (Kusupati et al.,
    NeurIPS 2022, "Matryoshka Representation Learning"; the
    adaptive-retrieval evaluation MRL-trained embeddings ship with, and
    what OpenAI/Nomic-style truncatable embedding APIs expose as the
    `dimensions` knob): rank the corpus for each panel query using only
    the FIRST d coordinates (re-normalized — prefix cosine), and score
    recall@{_MRL_K} of each truncation against the full-width ranking
    as ground truth, for d in {_MRL_DIMS}. The number a retrieval team
    reads before shrinking its index {_MRL_DIMS[-1]}→8: how much of the
    full-width top-{_MRL_K} survives each truncation.

    Determinism/parity: every prefix cosine is the same in-order left
    fold over i = 1..d, 6-dp rounded, ranked by the family's total
    (csd DESC, vec_id) order; overlap counts are exact integers and
    recall is one exact division by {_MRL_K}.

    Scale shape: ONE corpus scan fans against the broadcast 5-query
    panel x |dims| (scan-local explode — the per-row fan-out is the
    constant |dims|, not data); all rankings ride ONE (qid, dim)
    window exchange; the ranked frame persists for its two readers
    (truth + truncations — the house multi-reader rule) and the
    overlap join broadcasts the {_MRL_K}x5-row truth set. Panel size
    is the 100 TB knob, as for the nDCG/MRR eval twins.

    Reference anchor: beyond reference parity; completes the
    embedding-eval family (recall vs the index twins, nDCG, MRR) with
    the dimension-adaptivity axis."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ee")
    )
    qs = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("ee").alias("qe")
    )
    corpus = e.where(F.col("vec_id") >= 5)
    long = (
        corpus.crossJoin(F.broadcast(qs))
        .withColumn(
            "dim", F.explode(F.array(*[F.lit(d) for d in _MRL_DIMS]))
        )
        .select(
            "qid",
            "vec_id",
            "dim",
            S.cosine(
                F.expr("slice(ee, 1, dim)"), F.expr("slice(qe, 1, dim)")
            ).alias("csd"),
        )
    )
    w = Window.partitionBy("qid", "dim").orderBy(
        F.desc("csd"), F.asc("vec_id")
    )
    top = (
        long.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _MRL_K)
        .persist(StorageLevel.MEMORY_ONLY)
    )
    full = _MRL_DIMS[-1]
    truth = top.where(F.col("dim") == full).select(
        "qid", "vec_id", F.lit(1).alias("hit")
    )
    return (
        top.where(F.col("dim") != full)
        .join(F.broadcast(truth), ["qid", "vec_id"], "left")
        .groupBy("qid", "dim")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("n_overlap")
        )
        .select(
            "qid",
            F.col("dim").cast("int").alias("dim"),
            "n_overlap",
            (F.round(F.col("n_overlap") / F.lit(float(_MRL_K)), 6) + F.lit(0.0))
            .alias(f"recall_at_{_MRL_K}"),
        )
        .orderBy("qid", "dim")
    )

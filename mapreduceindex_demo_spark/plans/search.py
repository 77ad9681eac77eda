"""Full-text search query suite: BM25 ranked retrieval, positional phrase
match, and boolean conjunctive retrieval over the ``documents`` corpus.

This is the query-side twin of the reference's secondary-index scans
(reference: secondary/indexer scan pipeline, e.g. indexer/scan_coordinator.go
and the N1QL search surface): where ``mapindex_scan_range`` serves ordered
key lookups, this family serves *relevance-ranked* and *positional* lookups
over tokenized text — the retrieval shapes an LLM training-data pipeline
uses for corpus exploration, decontamination probes, and eval-set mining.

Engine design (Spark-first, no materialized inverted index needed):

- **BM25** is two corpus passes with NO wide shuffle: pass 1 computes the
  global statistics (N, Σdl, per-term document frequency) as a map-side
  partial aggregate folded into ONE row; pass 2 re-scans, computes each
  term's tf scan-locally with ``F.filter`` over the token array (no
  explode, no groupBy), scores against the broadcast statistics row, and
  feeds a TakeOrderedAndProject top-k heap. At 100 TB this is exactly the
  plan you want: the only exchanges are a 1-row broadcast and the k-row
  heap merge.
- **Phrase search** demonstrates the positional-postings shape: tokens are
  exploded WITH positions, filtered to the phrase's terms *before* any
  exchange (the postings are term-selective, tiny relative to the corpus),
  and adjacency is a pure equi-join on ``(doc_id, pos+1)`` — co-partitioned
  by the join keys, map-side combinable count on top.
- **Boolean AND** is the postings-intersection shape: per-(doc, term)
  counts for the query terms only, then an intersection expressed as
  ``COUNT(DISTINCT term) == |terms|`` — one shuffle over the filtered
  postings with partial aggregation.

Determinism contract (driver value-hash; see plans/registry.py): tf, df,
dl, N are exact integers in both engines; ``avgdl`` is one double division
of exact integers; each per-term BM25 contribution is rounded to 6 dp and
the final score is a FIXED-ORDER sum of the rounded contributions, so both
engines add bit-identical doubles in the same order. ``ln`` may differ in
the last ulp across libm implementations — the 6-dp rounding grid absorbs
it (same policy as TF-IDF / IVF in plans/llm.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceindex_demo_spark.plans.registry import query
from mapreduceindex_demo_spark.session import load_table

_BM25_TERMS = ("spark", "hash", "vector", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10

_PHRASE = ("hash", "join")
_AND_TERMS = ("customer", "vector", "spark")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _tf(term: str) -> Column:
    """Scan-local term frequency over the token array (a one-parameter
    lambda on purpose: PySpark calls a two-parameter higher-order-function
    lambda with (element, index))."""
    return F.size(F.filter("tk", lambda x: x == F.lit(term)))


def _spark_contrib(i: int) -> Column:
    """One term's BM25 contribution, rounded to the 6-dp grid."""
    tf = F.col(f"tf_{i}").cast("double")
    df = F.col(f"df_{i}").cast("double")
    n = F.col("n").cast("double")
    dl = F.col("dl").cast("double")
    idf = F.log(F.lit(1.0) + (n - df + F.lit(0.5)) / (df + F.lit(0.5)))
    denom = tf + F.lit(_BM25_K1) * (
        F.lit(1.0) - F.lit(_BM25_B) + F.lit(_BM25_B) * dl / F.col("avgdl")
    )
    return F.round(idf * (tf * F.lit(_BM25_K1 + 1.0)) / denom, 6)


def _duck_contrib(i: int) -> str:
    """The same contribution in DuckDB SQL, token-for-token the same
    arithmetic so both engines round identical doubles."""
    k1 = repr(_BM25_K1)
    b = repr(_BM25_B)
    k1p1 = repr(_BM25_K1 + 1.0)
    tf = f"CAST(tf_{i} AS DOUBLE)"
    df = f"CAST(df_{i} AS DOUBLE)"
    return (
        f"round(ln(1.0 + (CAST(n AS DOUBLE) - {df} + 0.5) / ({df} + 0.5))"
        f" * ({tf} * {k1p1})"
        f" / ({tf} + {k1} * (1.0 - {b} + {b} * CAST(dl AS DOUBLE) / avgdl)), 6)"
    )


_DUCK_TF_COLS = ", ".join(
    f"len(list_filter(tk, x -> x = '{t}')) AS tf_{i}"
    for i, t in enumerate(_BM25_TERMS)
)
_DUCK_DF_COLS = ", ".join(
    f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
    for i in range(len(_BM25_TERMS))
)
_DUCK_SCORE = " + ".join(_duck_contrib(i) for i in range(len(_BM25_TERMS)))
_DUCK_NHITS = " + ".join(
    f"CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END" for i in range(len(_BM25_TERMS))
)


#: shared by search_bm25_topk (scan-served) and search_bm25_indexed
#: (served from the durable token/doclen indexes): same ranking, one oracle.
_BM25_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, len(tk) AS dl, {_DUCK_TF_COLS}
      FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
             {_DUCK_DF_COLS}
      FROM t),
    scored AS (
      SELECT doc_id,
             round({_DUCK_SCORE}, 6) + 0.0 AS score,
             CAST({_DUCK_NHITS} AS INT) AS n_hits
      FROM t CROSS JOIN s)
    SELECT doc_id, score, n_hits FROM scored
    WHERE n_hits > 0
    ORDER BY score DESC, doc_id
    LIMIT {_BM25_TOPK}
    """


@query(
    "search_bm25_topk",
    oracle=_BM25_ORACLE,
    tags=("search", "bm25", "text"),
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (k1=1.2, b=0.75) for a fixed 4-term keyword
    query, top-10 by relevance.

    Scale shape: pass 1 folds the corpus statistics (N, Σdl, per-term df)
    into ONE row via map-side partial aggregation — no groupBy key, so the
    exchange carries one partial row per task. Pass 2 computes tf for each
    query term scan-locally with an array ``filter`` (no explode → no
    (doc, term) shuffle at all), scores against the broadcast stats row,
    and TakeOrderedAndProject merges per-partition top-k heaps. Total
    exchange volume is O(tasks + k), independent of corpus size.
    """
    return bm25_scan_over(_t(spark, sf_dir, "documents"))


def _bm25_rank(scored_base: DataFrame) -> DataFrame:
    """Shared scoring tail: fixed-order rounded contributions over a frame
    carrying (doc_id, dl, tf_0..tf_{n-1}) joined with the broadcast stats
    row (n, avgdl, df_0..df_{n-1}); total (score desc, doc_id) order."""
    score = _spark_contrib(0)
    for i in range(1, len(_BM25_TERMS)):
        score = score + _spark_contrib(i)
    n_hits = (F.col("tf_0") > 0).cast("int")
    for i in range(1, len(_BM25_TERMS)):
        n_hits = n_hits + (F.col(f"tf_{i}") > 0).cast("int")
    return (
        scored_base.select(
            "doc_id",
            (F.round(score, 6) + F.lit(0.0)).alias("score"),
            n_hits.cast("int").alias("n_hits"),
        )
        .where(F.col("n_hits") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_BM25_TOPK)
    )


def bm25_scan_over(docs: DataFrame) -> DataFrame:
    """Scan-served BM25 over an arbitrary (doc_id, text) frame — the core
    behind [q:search_bm25_topk], reused by the CDC-maintained-index
    equivalence test."""
    t = docs.select(
        "doc_id",
        F.split("text", " ").alias("tk"),
    ).select(
        "doc_id",
        F.size("tk").alias("dl"),
        *[_tf(term).alias(f"tf_{i}") for i, term in enumerate(_BM25_TERMS)],
    )
    stats = t.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    return _bm25_rank(t.crossJoin(F.broadcast(stats)))


@query(
    "search_phrase_positional",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    m AS (
      SELECT doc_id,
        CAST(len(list_filter(range(1, len(tk)),
             i -> tk[i] = '{_PHRASE[0]}' AND tk[i + 1] = '{_PHRASE[1]}'))
          AS BIGINT) AS n_matches
      FROM toks)
    SELECT doc_id, n_matches FROM m WHERE n_matches > 0
    """,
    tags=("search", "phrase", "text"),
)
def q_phrase_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search: documents containing the exact bigram
    "hash join", with occurrence counts — the positional-postings shape
    (reference: the secondary index's array/position encoding in the scan
    pipeline).

    Scale shape: tokens explode WITH positions, are filtered to the two
    phrase terms BEFORE any exchange (postings are term-selective), and
    adjacency is a pure equi-join on ``(doc_id, pos+1) = (doc_id, pos)``
    — both sides hash-partition on the same composite key, and the match
    count aggregates with map-side combine. The corpus is scanned once
    per posting list; the joined volume is |postings|, not |tokens|.
    """
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    first = toks.where(F.col("term") == _PHRASE[0]).select(
        "doc_id", (F.col("pos") + F.lit(1)).alias("nxt")
    )
    second = toks.where(F.col("term") == _PHRASE[1]).select(
        F.col("doc_id").alias("doc2"), F.col("pos").alias("pos2")
    )
    return (
        first.join(
            second,
            (F.col("doc_id") == F.col("doc2")) & (F.col("nxt") == F.col("pos2")),
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


_DUCK_AND_TF = ", ".join(
    f"len(list_filter(tk, x -> x = '{t}')) AS tf_{i}"
    for i, t in enumerate(_AND_TERMS)
)
_DUCK_AND_SUM = " + ".join(f"tf_{i}" for i in range(len(_AND_TERMS)))
_DUCK_AND_PRED = " AND ".join(f"tf_{i} > 0" for i in range(len(_AND_TERMS)))


@query(
    "search_boolean_and",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_AND_TF}
      FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents))
    SELECT doc_id, CAST({_DUCK_AND_SUM} AS BIGINT) AS tf_total
    FROM t WHERE {_DUCK_AND_PRED}
    """,
    tags=("search", "boolean", "text"),
)
def q_boolean_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean conjunctive retrieval: documents containing ALL query terms,
    with the summed term frequency — the postings-intersection shape.

    Scale shape: tokens are filtered to the query terms before the only
    exchange; per-(doc, term) counts partial-aggregate map-side; the
    intersection is ``COUNT(DISTINCT term) == |terms|`` over rows already
    unique per (doc, term), so it is a plain count. The shuffle carries
    the filtered postings only.
    """
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    postings = (
        toks.where(F.col("term").isin(*_AND_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        postings.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("tf").alias("tf_total"),
        )
        .where(F.col("n_terms") == len(_AND_TERMS))
        .select("doc_id", "tf_total")
    )


@query(
    "search_bm25_indexed",
    oracle=_BM25_ORACLE,
    tags=("search", "bm25", "text", "mapindex", "durable"),
)
def q_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME BM25 ranking served from DURABLE secondary indexes instead
    of a corpus scan — the subsystem bridge: the engine's array index over
    ``split(text, ' ')`` is exactly an inverted postings table (reference:
    IsArrayIndex, index.go:187), and a second single-key index over the
    token count is the doc-length table.

    Build once (both indexes persist via save_index; a FRESH engine
    reopens them from storage), then per query:

    - postings for the 4 query terms come from a key-filtered scan of the
      token index — the durable layout is key-sorted within every bucket
      file, so parquet row-group stats prune the scan to the groups
      actually holding those terms; the corpus text is never read;
    - tf per (doc, term) folds into FIXED per-term columns in one
      map-side-combined groupBy(doc_id) (conditional sums — keeping the
      score a fixed-order expression, bit-identical to the scan-served
      variant and the shared oracle);
    - df/N/avgdl are one slim aggregate over each index (2-column reads),
      broadcast as a 1-row frame;
    - matched docs join their length on doc_id (AQE-sized), score with
      the identical rounded fixed-order formula, TakeOrderedAndProject
      top-k.

    At 100 TB the scan-served variant reads the corpus per query; this
    one reads posting rows for the query terms only — the search twin of
    the mapindex range-scan-vs-table-scan trade, priced by the same
    durable layout.
    """
    import atexit
    import shutil
    import tempfile

    from mapreduceindex_demo_spark.catalog import IndexDefn
    from mapreduceindex_demo_spark.mapindex import MapIndexEngine
    from mapreduceindex_demo_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    eng = MapIndexEngine(spark)
    eng.create_index(
        IndexDefn(
            name="idx_bm25_tokens",
            bucket="documents",
            sec_exprs=("split(text, ' ')",),
            is_array_index=True,
        ),
        docs,
        doc_id_col="doc_id",
    )
    eng.create_index(
        IndexDefn(
            name="idx_bm25_doclen",
            bucket="documents",
            sec_exprs=("size(split(text, ' '))",),
        ),
        docs,
        doc_id_col="doc_id",
    )
    root = tempfile.mkdtemp(prefix="mrix_bm25_idx_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    eng.save_index("idx_bm25_tokens", f"{root}/tokens", buckets=8)
    eng.save_index("idx_bm25_doclen", f"{root}/doclen", buckets=8)

    fresh = MapIndexEngine(spark)
    tok = fresh.load_index(f"{root}/tokens")
    dlen = fresh.load_index(f"{root}/doclen")
    return bm25_from_indexes(tok, dlen)


def bm25_from_indexes(tok: DataFrame, dlen: DataFrame) -> DataFrame:
    """Index-served BM25 over a token index (key_0=token, doc_id) and a
    doc-length index (key_0=token count, doc_id) — the serving core behind
    [q:search_bm25_indexed], reused by the CDC-maintained-index
    equivalence test."""
    postings = tok.where(F.col("key_0").isin(*_BM25_TERMS))
    tf = postings.groupBy("doc_id").agg(
        *[
            F.sum((F.col("key_0") == term).cast("long")).alias(f"tf_{i}")
            for i, term in enumerate(_BM25_TERMS)
        ]
    )
    # two 1-row aggregates cross-joined AFTER aggregation — no per-row
    # stat columns, no order-sensitive first() recovery
    dl_stats = dlen.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum("key_0").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    df_stats = tf.agg(
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ]
    )
    stats = dl_stats.crossJoin(df_stats)
    return _bm25_rank(
        tf.join(dlen.select("doc_id", F.col("key_0").alias("dl")), "doc_id")
        .crossJoin(F.broadcast(stats))
    )


_PREFIX = "s"
_PREFIX_HIGH = "t"  # next string after every token starting with "s"


@query(
    "search_prefix_scan",
    oracle=f"""
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_terms
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents)
    WHERE tok >= '{_PREFIX}' AND tok < '{_PREFIX_HIGH}'
    GROUP BY 1
    """,
    tags=("search", "prefix", "mapindex", "durable"),
)
def q_prefix_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix search served from the DURABLE token index: ``s*`` expands to
    every vocabulary term in the key range [prefix, next-prefix) — a pure
    leading-key RANGE SCAN over the inverted-postings index (reference
    composite Low/High scan keys, index.go:137-156; the same bracket an
    LSM prefix iterator uses), then per-doc hit/term counts.

    The serving path is the search twin of [q:mapindex_scan_range]: the
    durable layout is key-sorted within every bucket file, so the range
    predicate reaches the parquet scan as pushed filters and row-group
    stats prune the postings outside [low, high) — the corpus text is
    never read at query time (plan-shape asserted in
    tests/test_search_maintenance.py). The scan runs ``ordered=False``:
    the aggregation destroys order anyway, so the only exchange is the
    per-doc groupBy over the range's postings. At 100 TB a prefix query
    touches the posting files whose stats intersect the range — cost
    scales with the prefix's selectivity, not the corpus.
    """
    import atexit
    import shutil
    import tempfile

    from mapreduceindex_demo_spark.catalog import IndexDefn
    from mapreduceindex_demo_spark.mapindex import INCL_LOW, MapIndexEngine

    docs = _t(spark, sf_dir, "documents")
    eng = MapIndexEngine(spark)
    eng.create_index(
        IndexDefn(
            name="idx_prefix_tokens",
            bucket="documents",
            sec_exprs=("split(text, ' ')",),
            is_array_index=True,
        ),
        docs,
        doc_id_col="doc_id",
    )
    root = tempfile.mkdtemp(prefix="mrix_prefix_idx_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    eng.save_index("idx_prefix_tokens", root, buckets=8)

    fresh = MapIndexEngine(spark)
    fresh.load_index(root)
    hits = fresh.scan(
        "idx_prefix_tokens",
        low=_PREFIX,
        high=_PREFIX_HIGH,
        inclusion=INCL_LOW,  # low inclusive, high exclusive: [s, t)
        ordered=False,
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.countDistinct("key_0").cast("long").alias("n_terms"),
    )


_PROX_TERMS = ("hash", "vector")
_PROX_SLOP = 3


@query(
    "search_proximity_window",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    p1 AS (SELECT doc_id, unnest(list_filter(range(1, len(tk) + 1),
                 i -> tk[i] = '{_PROX_TERMS[0]}')) AS a FROM toks),
    p2 AS (SELECT doc_id, unnest(list_filter(range(1, len(tk) + 1),
                 i -> tk[i] = '{_PROX_TERMS[1]}')) AS b FROM toks)
    SELECT p1.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(abs(a - b)) AS BIGINT) AS min_dist
    FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND abs(a - b) <= {_PROX_SLOP}
    GROUP BY 1
    """,
    tags=("search", "proximity", "text"),
)
def q_proximity_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity search: documents where "hash" and "vector" occur within
    a 3-token window, with pair counts and closest distance — the slop
    generalization of the exact-adjacency phrase query
    ([q:search_phrase_positional], slop=1 ordered; this is unordered
    slop=3).

    Scale shape: the two positional posting lists are term-filtered
    BEFORE the exchange, the join is equi on doc_id with the slop band as
    a post-join filter — the doc_id equi-key does the distribution work,
    and the band only ever compares positions WITHIN one document's
    postings (per-doc posting lists are bounded by document length, so
    the intra-doc pair work is bounded, never |postings|²)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    p1 = toks.where(F.col("term") == _PROX_TERMS[0]).select("doc_id", F.col("pos").alias("a"))
    p2 = toks.where(F.col("term") == _PROX_TERMS[1]).select(
        F.col("doc_id").alias("doc2"), F.col("pos").alias("b")
    )
    return (
        p1.join(
            p2,
            (F.col("doc_id") == F.col("doc2"))
            & (F.abs(F.col("a") - F.col("b")) <= F.lit(_PROX_SLOP)),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min(F.abs(F.col("a") - F.col("b"))).cast("long").alias("min_dist"),
        )
    )


_RRF_K = 60
_RRF_TOPK = 10

_COSINE_LIST_ORACLE = """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
               WHERE vec_id = 0),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee FROM embeddings
          WHERE vec_id <> 0)
    SELECT vec_id,
      round(list_reduce(list_transform(range(1, len(ee) + 1),
              i -> ee[i] * qe[i]), (x, y) -> x + y)
            / (sqrt(list_reduce(list_transform(range(1, len(ee) + 1),
                 i -> ee[i] * ee[i]), (x, y) -> x + y))
               * sqrt(list_reduce(list_transform(range(1, len(qe) + 1),
                 i -> qe[i] * qe[i]), (x, y) -> x + y))), 6)
        + 0.0 AS cos_sim
    FROM e, q
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """


@query(
    "search_hybrid_rrf",
    oracle=f"""
    WITH bm AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rt
      FROM ({_BM25_ORACLE})),
    vec AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rv
      FROM ({_COSINE_LIST_ORACLE}))
    SELECT COALESCE(bm.doc_id, vec.doc_id) AS doc_id,
           round(COALESCE(1.0 / ({_RRF_K} + rt), 0.0)
                 + COALESCE(1.0 / ({_RRF_K} + rv), 0.0), 6) + 0.0 AS rrf_score,
           CAST(rt AS BIGINT) AS rank_text,
           CAST(rv AS BIGINT) AS rank_vec
    FROM bm FULL OUTER JOIN vec ON bm.doc_id = vec.doc_id
    """,
    tags=("search", "hybrid", "rrf", "similarity"),
)
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-10 fused with embedding cosine
    top-10 by Reciprocal Rank Fusion (score = Σ 1/(60 + rank)) — the
    modality-fusion step of a modern search stack, expressed over the
    engine's existing ranked lists (documents.doc_id ≡ embeddings.vec_id,
    the multimodal id mapping of [q:multimodal_doc_embedding_join]).

    Determinism: both input rankings carry total tie-break orders, and
    the fused score is ONE fixed-order expression of the two integer
    ranks rounded to 6 dp — bit-identical across engines. Scale shape:
    each list is an independently-priced top-k (BM25's zero-shuffle
    double scan; the broadcast-query cosine heap); the fusion joins two
    k-row frames — free at any corpus size. At serving scale the same
    fusion runs over the index-served BM25 ([q:search_bm25_indexed]) and
    the IVF probe ([q:similarity_ivf_durable])."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    bm = bm25_scan_over(d).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("rt"),
    )
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qe")
    )
    from mapreduceindex_demo_spark.functions import similarity as S

    vec = (
        e.where(F.col("vec_id") != 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("ee"))
        .crossJoin(F.broadcast(q))
        .select("vec_id", S.cosine(F.col("ee"), F.col("qe")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(_RRF_TOPK)
        .select(
            F.col("vec_id").alias("doc_id2"),
            F.row_number()
            .over(Window.orderBy(F.desc("cos_sim"), F.asc("vec_id")))
            .alias("rv"),
        )
    )
    fused = bm.join(vec, F.col("doc_id") == F.col("doc_id2"), "full_outer")
    return fused.select(
        F.coalesce(F.col("doc_id"), F.col("doc_id2")).alias("doc_id"),
        (
            F.round(
                F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("rt")), F.lit(0.0))
                + F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("rv")), F.lit(0.0)
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("rrf_score"),
        F.col("rt").cast("long").alias("rank_text"),
        F.col("rv").cast("long").alias("rank_vec"),
    )


_SNIP_TERM = "vector"
_SNIP_RADIUS = 3
_SNIP_TOPK = 10


@query(
    "search_snippet_highlight",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    m AS (SELECT doc_id, toks,
                 list_position(toks, '{_SNIP_TERM}') AS p,
                 len(list_filter(toks, t -> t = '{_SNIP_TERM}')) AS tf
          FROM d WHERE list_contains(toks, '{_SNIP_TERM}'))
    SELECT doc_id, CAST(tf AS BIGINT) AS tf,
           CAST(p AS BIGINT) AS first_pos,
           array_to_string(
             toks[GREATEST(1, p - {_SNIP_RADIUS})
                  : GREATEST(1, p - {_SNIP_RADIUS}) + {2 * _SNIP_RADIUS}],
             ' ') AS snippet
    FROM m ORDER BY tf DESC, doc_id LIMIT {_SNIP_TOPK}
    """,
    tags=("search", "snippet"),
)
def q_search_snippet_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snippet generation — the result-page half of the search surface:
    for the top-k docs by term frequency, return the +/-3-token window
    around the FIRST occurrence of the query term (the keyword-in-context
    display every retrieval UI shows under a hit). Completes the family:
    [q:search_bm25_topk] ranks, this renders.

    Scale shape: match detection, tf, first-position, and the snippet
    slice are all scan-local built-in array expressions over the token
    array (array_contains / filter / array_position / slice — no explode,
    no UDF), so the corpus pass is whole-stage-codegen'd; the only
    exchange is the k-row TakeOrderedAndProject heap merge. Window
    clamping at both text edges matches the oracle exactly: start =
    max(1, p-3), fixed 7-token length, both engines clamp the tail at
    the array end.

    Determinism: tf and position are exact ints; the (tf DESC, doc_id)
    order is total."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    m = d.where(F.array_contains("toks", _SNIP_TERM)).select(
        "doc_id",
        "toks",
        F.array_position("toks", _SNIP_TERM).alias("p"),
        F.size(
            F.filter("toks", lambda t: t == F.lit(_SNIP_TERM))
        ).cast("long").alias("tf"),
    )
    start = F.greatest(F.lit(1), F.col("p") - _SNIP_RADIUS)
    return (
        m.select(
            "doc_id",
            "tf",
            F.col("p").cast("long").alias("first_pos"),
            F.array_join(
                F.slice("toks", start, 2 * _SNIP_RADIUS + 1), " "
            ).alias("snippet"),
        )
        .orderBy(F.desc("tf"), F.asc("doc_id"))
        .limit(_SNIP_TOPK)
    )

"""Corpus-curation operators round 7b: rule-based quality gating
(C4-style), boilerplate-prefix detection, and token-budget selection.

These fill the three pipeline stages between the suite's existing signals
and its existing samplers: a *rule gate* that drops documents for named,
auditable reasons (vs [q:text_quality_score]'s single scalar),
a *boilerplate detector* that finds template-prefix families the
fingerprint dedup ([q:dedup_exact]) misses when tails differ, and a
*budget selector* that turns "take the best N tokens per source" into a
deterministic, resumable plan (vs [q:curation_weighted_sample]'s
probability-proportional draw).

All three are built-in-expression plans (zero Python UDFs): tokenization
is `split`, rules are boolean columns, selection is one window. The only
shuffles are per-source/per-prefix aggregations — O(groups), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceindex_demo_spark.oracle_harness import duck_hex_int, spark_bigram_sql
from mapreduceindex_demo_spark.plans.registry import query
from mapreduceindex_demo_spark.session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- C4-style rule gate thresholds (each rule fails a real fraction of the
# generated corpus at sf0.01: 106/34/28/240 of 500 docs respectively) ---
_MIN_TOKENS = 30
_WORDLEN_LO, _WORDLEN_HI = 3.5, 4.8
_STOPWORD_MAX = 0.12
_DIVERSITY_MIN = 0.45
_STOPWORDS = ("a", "the")


@query(
    "text_c4_style_gate",
    oracle=f"""
    WITH d AS (SELECT source, text, string_split(text, ' ') AS toks,
                      len(string_split(text, ' ')) AS n
               FROM documents),
    r AS (SELECT source,
            (n >= {_MIN_TOKENS}) AS ok_len,
            ((length(text) - n + 1.0) / n
               BETWEEN {_WORDLEN_LO} AND {_WORDLEN_HI}) AS ok_wordlen,
            (len(list_filter(toks, t -> t = 'a' OR t = 'the')) * 1.0 / n
               <= {_STOPWORD_MAX}) AS ok_stop,
            (len(list_distinct(toks)) * 1.0 / n
               >= {_DIVERSITY_MIN}) AS ok_div
          FROM d)
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS docs,
      CAST(SUM(CASE WHEN ok_len AND ok_wordlen AND ok_stop AND ok_div
               THEN 1 ELSE 0 END) AS BIGINT) AS kept,
      CAST(SUM(CASE WHEN NOT ok_len THEN 1 ELSE 0 END) AS BIGINT)
        AS fail_short,
      CAST(SUM(CASE WHEN NOT ok_wordlen THEN 1 ELSE 0 END) AS BIGINT)
        AS fail_wordlen,
      CAST(SUM(CASE WHEN NOT ok_stop THEN 1 ELSE 0 END) AS BIGINT)
        AS fail_stopword,
      CAST(SUM(CASE WHEN NOT ok_div THEN 1 ELSE 0 END) AS BIGINT)
        AS fail_diversity,
      round(SUM(CASE WHEN ok_len AND ok_wordlen AND ok_stop AND ok_div
                THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) + 0.0 AS retention
    FROM r GROUP BY 1
    """,
    tags=("llm", "text", "curation", "gate"),
)
def q_text_c4_style_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style RULE gate (Raffel et al. 2020's heuristic-filter stage):
    each document passes four named boolean rules — minimum length,
    mean-word-length band, stopword-ratio ceiling, lexical-diversity floor
    — and the per-source report counts each rule's violations separately,
    so a curation team sees WHY a feed loses documents, not just how many
    ([q:text_quality_score] gives the scalar; this gives the audit trail).

    Determinism: every rule compares a double that is ONE division of
    exact integers (char/token/stopword/distinct counts), so both engines
    compute bit-identical IEEE values and the boolean gates agree exactly;
    aggregates are integer counts plus one rounded ratio.

    Scale shape: rules are scan-local built-in expressions (split/filter/
    array_distinct — no explode, no UDF); the only exchange is the final
    per-source partial-aggregated groupBy. At 100 TB this runs at scan
    speed with an O(|sources|) shuffle."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    wordlen = (F.length("text") - n + F.lit(1.0)) / n
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS))) * F.lit(1.0) / n
    )
    diversity = F.size(F.array_distinct(toks)) * F.lit(1.0) / n
    r = d.select(
        "source",
        (n >= _MIN_TOKENS).alias("ok_len"),
        ((wordlen >= _WORDLEN_LO) & (wordlen <= _WORDLEN_HI)).alias(
            "ok_wordlen"
        ),
        (stop_ratio <= _STOPWORD_MAX).alias("ok_stop"),
        (diversity >= _DIVERSITY_MIN).alias("ok_div"),
    )
    ok_all = (
        F.col("ok_len") & F.col("ok_wordlen") & F.col("ok_stop") & F.col("ok_div")
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return r.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        cnt(ok_all).alias("kept"),
        cnt(~F.col("ok_len")).alias("fail_short"),
        cnt(~F.col("ok_wordlen")).alias("fail_wordlen"),
        cnt(~F.col("ok_stop")).alias("fail_stopword"),
        cnt(~F.col("ok_div")).alias("fail_diversity"),
        (
            F.round(
                F.sum(F.when(ok_all, 1).otherwise(0)) * F.lit(1.0)
                / F.count(F.lit(1)),
                6,
            )
            + F.lit(0.0)
        ).alias("retention"),
    )


_PREFIX_TOKENS = 8


@query(
    "dedup_boilerplate_prefix",
    oracle=f"""
    WITH p AS (SELECT doc_id, source,
                 md5(array_to_string(
                   (string_split(text, ' '))[1:{_PREFIX_TOKENS}], ' '))
                   AS prefix_hash
               FROM documents)
    SELECT prefix_hash,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM p GROUP BY 1 HAVING COUNT(*) >= 2
    """,
    tags=("llm", "dedup", "boilerplate"),
)
def q_dedup_boilerplate_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-prefix families: documents sharing an identical
    first-8-token prefix — the Common-Crawl template signal
    (headers, navigation, license banners) that whole-document
    fingerprinting ([q:dedup_exact]) misses whenever the tails differ and
    shingle MinHash ([q:dedup_minhash_lsh_pairs]) under-weights because
    the shared region is a small fraction of the doc. One row per prefix
    family with ≥2 members: size, source spread (cross-source families
    are template reuse, single-source are feed boilerplate), and the
    doc-id bracket for drill-down.

    Scale shape: prefix hash is scan-local (slice + md5, no explode);
    the groupBy on the hash is the standard exact-dedup exchange with
    map-side partial aggregation, and the HAVING collapses the output to
    family rows only. O(distinct prefixes) shuffle."""
    d = _t(spark, sf_dir, "documents")
    prefix = F.md5(
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, _PREFIX_TOKENS), " ")
    )
    return (
        d.select("doc_id", "source", prefix.alias("prefix_hash"))
        .groupBy("prefix_hash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )


_TOKEN_BUDGET = 800


@query(
    "curation_token_budget",
    oracle=f"""
    WITH d AS (SELECT source, doc_id,
                      len(string_split(text, ' ')) AS ntok,
                      md5(CAST(doc_id AS VARCHAR)) AS pri
               FROM documents),
    w AS (SELECT source, ntok,
            SUM(ntok) OVER (PARTITION BY source ORDER BY pri
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
          FROM d)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs_kept,
           CAST(SUM(ntok) AS BIGINT) AS tokens_kept,
           round(SUM(ntok) / {_TOKEN_BUDGET}.0, 6) + 0.0
             AS budget_utilization
    FROM w WHERE cum <= {_TOKEN_BUDGET} GROUP BY 1
    """,
    tags=("llm", "curation", "budget"),
)
def q_curation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection: each source contributes documents in a
    DETERMINISTIC pseudo-random order (md5 of the doc id — a seeded
    shuffle both engines reproduce bit-for-bit) until its cumulative
    token count reaches the per-source budget (800 tokens).
    This is how a training-mix target ("equal token budget per feed",
    [q:training_mix_weights] computes the weights) becomes an actual
    document list — resumable, because re-running with a larger budget
    KEEPS every previously selected doc and extends the prefix (the
    selection order is a pure function of doc ids).

    Determinism: the running sum is exact integers ordered by unique md5
    keys — no ties, no float accumulation.

    Scale shape: ONE window per source (shuffle by source, sort by hash
    key within); counts/sums are exact ints. At extreme per-source
    cardinality the same selection can run as a two-pass quantile cut
    (find the hash threshold whose prefix sums to the budget, then
    filter), trading the sort for two scans — the window form is the
    simpler plan and the per-source sort is bounded by the largest
    single feed, not the corpus."""
    d = _t(spark, sf_dir, "documents").select(
        "source",
        F.size(F.split(F.col("text"), " ")).alias("ntok"),
        F.md5(F.col("doc_id").cast("string")).alias("pri"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("pri")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sel = d.withColumn("cum", F.sum("ntok").over(w)).where(
        F.col("cum") <= _TOKEN_BUDGET
    )
    return sel.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs_kept"),
        F.sum("ntok").cast("long").alias("tokens_kept"),
        (
            F.round(F.sum("ntok") / F.lit(float(_TOKEN_BUDGET)), 6) + F.lit(0.0)
        ).alias("budget_utilization"),
    )


# ==========================================================================
# Pareto frontier (skyline) over quality × length
# ==========================================================================

#: local-skyline buckets — any disjoint partitioning is correct (the
#: skyline operator is distributive: the global skyline is a subset of the
#: union of per-partition skylines), so the bucket count only tunes
#: parallelism of the local pass
_SKY_BUCKETS = 32


@query(
    "curation_pareto_frontier",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
        len(string_split(text, ' ')) AS ntok,
        len(list_distinct(string_split(text, ' '))) AS ndis,
        n_chars
      FROM documents),
    s AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
        CAST(round(round(LEAST(CAST(ntok AS DOUBLE) / 100.0, 1.0)
                         * (CAST(ndis AS DOUBLE) / CAST(ntok AS DOUBLE)), 6)
                   * 1000000, 0) AS BIGINT) AS qm
      FROM t)
    SELECT p.doc_id, p.source, p.n_chars,
           round(CAST(p.qm AS DOUBLE) / 1000000.0, 6) + 0.0 AS quality
    FROM s p
    WHERE NOT EXISTS (
      SELECT 1 FROM s o
      WHERE o.qm >= p.qm AND o.n_chars >= p.n_chars
        AND (o.qm > p.qm OR o.n_chars > p.n_chars))
    """,
    tags=("curation", "skyline", "pareto"),
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (SKYLINE, Börzsönyi et al. 2001) of the corpus
    under two maximize-criteria — quality score and length: the documents
    no other document beats on BOTH axes (strict in at least one). The
    multi-objective version of the suite's single-scalar gates: a
    curation team keeps the frontier when it won't collapse quality and
    volume into one weighted number. Exact-tie points (same quality, same
    length) don't dominate each other — both stay, matching the NOT
    EXISTS oracle.

    The skyline trick that avoids all-pairs: sort by quality, and a doc
    is dominated iff some strictly-higher-quality doc is at least as
    long (a running MAX over the strictly-greater range — RANGE BETWEEN
    1 FOLLOWING AND UNBOUNDED on the quality axis) or some equal-quality
    doc is strictly longer (the RANGE CURRENT ROW frame). Two window
    functions replace the O(n²) self-join.

    Scale shape (distributive two-phase, the classic distributed
    skyline): phase 1 computes that window pass WITHIN each of 32
    disjoint hash buckets — local skylines, fully parallel, one bucketed
    exchange; phase 2 re-runs the identical pass globally over only the
    local survivors (frontier-sized input: the one global-ordered window
    in the plan sees |local skylines| rows, never the corpus — the
    'tiny window' pattern the curated_training_set plan test pins).
    Quality is the 6-dp-rounded score lifted to exact integer
    micro-units, so every dominance comparison is integer."""
    from mapreduceindex_demo_spark.functions import text as TX

    d = _t(spark, sf_dir, "documents")
    # the SAME scalar every other quality gate ranks on
    # ([q:text_quality_score], [q:quality_percentile_gate]) — lifted to
    # exact integer micro-units for the dominance comparisons
    s = d.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(TX.quality_score() * 1000000, 0).cast("long").alias("qm"),
    )

    def skyline_pass(df: DataFrame, *part) -> DataFrame:
        base = Window.partitionBy(*part) if part else Window.partitionBy()
        hi = base.orderBy(F.asc("qm")).rangeBetween(1, Window.unboundedFollowing)
        eq = base.orderBy(F.asc("qm")).rangeBetween(0, 0)
        return (
            df.withColumn("mx_hi", F.max("n_chars").over(hi))
            .withColumn("mx_eq", F.max("n_chars").over(eq))
            .where(
                (F.col("mx_hi").isNull() | (F.col("mx_hi") < F.col("n_chars")))
                & (F.col("mx_eq") <= F.col("n_chars"))
            )
            .drop("mx_hi", "mx_eq")
        )

    local = skyline_pass(
        s.withColumn("b", F.pmod(F.col("doc_id"), F.lit(_SKY_BUCKETS))), "b"
    ).drop("b")
    return skyline_pass(local).select(
        "doc_id",
        "source",
        "n_chars",
        (F.round(F.col("qm").cast("double") / 1000000.0, 6) + F.lit(0.0)).alias(
            "quality"
        ),
    )


#: smoothing pseudo-count for target encoding (Micci-Barreca's m)
_TE_M = 50

_TARGET_ENC_ORACLE = f"""
    WITH j AS (SELECT p.p_brand,
                      CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS r
               FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    b AS (SELECT p_brand, COUNT(*) AS n, CAST(SUM(r) AS BIGINT) AS ret
          FROM j GROUP BY 1),
    g AS (SELECT COUNT(*) AS nn, CAST(SUM(r) AS BIGINT) AS rr FROM j)
    SELECT p_brand, n AS n_lines, ret AS n_returns,
           round(CAST(ret AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0
             AS raw_rate,
           round(CAST(ret * nn + {_TE_M} * rr AS DOUBLE)
                 / CAST((n + {_TE_M}) * nn AS DOUBLE), 6) + 0.0 AS enc_rate
    FROM b CROSS JOIN g ORDER BY p_brand
    """


@query(
    "feature_target_encoding",
    oracle=_TARGET_ENC_ORACLE,
    tags=("curation", "feature-engineering", "target-encoding"),
)
def q_feature_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of a categorical feature (Micci-Barreca,
    SIGKDD Explorations 2001 — the leakage-safe categorical encoder every
    tabular-ML feature pipeline ships): each part brand's return rate
    shrunk toward the global prior by a pseudo-count of m=50,
    ``enc = (returns + m*prior) / (n + m)``. Computed as ONE exact
    integer rational ``(ret*N + m*R) / ((n+m)*N)`` — products of exact
    BIGINT counts, a single final IEEE division — so no float
    accumulation order exists on either engine (the int64 products stay
    exact to ~sf100's N² / |brands| ≈ 1.4e16, well under 2^63; beyond
    that the spelling switches to the prior-as-double form).

    Scale shape: one fact pass — lineitem joins the part dimension
    (AQE-broadcast at bench scale, the standard dim edge at 100 TB), the
    per-brand rollup is a |brands|-row combiner groupBy, and the global
    prior is a 1-row broadcast cross join. Encoded rate and raw rate are
    served side by side so the shrinkage is visible: rare brands pull
    toward the prior, common brands keep their empirical rate."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(pt, li["l_partkey"] == pt["p_partkey"]).select(
        "p_brand",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("r"),
    )
    b = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"), F.sum("r").alias("ret")
    )
    g = j.agg(
        F.count(F.lit(1)).alias("nn"), F.sum("r").alias("rr")
    )
    m = F.lit(_TE_M)
    return (
        b.crossJoin(F.broadcast(g))
        .select(
            "p_brand",
            F.col("n").alias("n_lines"),
            F.col("ret").alias("n_returns"),
            (
                F.round(F.col("ret").cast("double") / F.col("n").cast("double"), 6)
                + F.lit(0.0)
            ).alias("raw_rate"),
            (
                F.round(
                    (F.col("ret") * F.col("nn") + m * F.col("rr")).cast("double")
                    / ((F.col("n") + m) * F.col("nn")).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("enc_rate"),
        )
        .orderBy("p_brand")
    )


# ==========================================================================
# round 13: DSIR — data selection with importance resampling
# ==========================================================================

#: hashed-feature bucket count. FIXED, so the per-bucket LM tables are
#: bounded at <= _DSIR_B rows however large the corpus grows —
#: broadcast-able at any scale; 4096 matches the corpus (vocabulary ~50
#: words: enough buckets that collisions are rare, small enough that
#: add-1 smoothing isn't drowned by empty buckets).
_DSIR_B = 4096
#: top-k documents served
_DSIR_TOPK = 20
#: the per-bucket log importance ratio ln(p_target(b)/p_raw(b)) under
#: add-1 smoothing, as a 6-dp MICRO-UNIT BIGINT: one ln-chain per
#: bucket, spelled identically for both engines over exact BIGINT
#: counts (ct, cs, nt, ns columns), rounded to the 1e-6 grid and THEN
#: integer-cast (round-before-cast: after round the double is an exact
#: integer, so Spark's truncating cast and DuckDB's rounding cast
#: agree — the _snm_acct_skey precedent). Per-document weights are then
#: SUMS OF INTEGERS — exactly order-independent, so cross-engine hash
#: parity never depends on float summation order (the
#: [q:text_char_entropy_gate] micro-unit pattern; the ln-on-exact-counts
#: parity precedent is [q:text_pmi_collocations]).
_DSIR_LR_MICRO = (
    "CAST(round((ln(CAST(ct + 1 AS DOUBLE)) - ln(CAST(cs + 1 AS DOUBLE))"
    f" + ln(CAST(ns + {_DSIR_B} AS DOUBLE))"
    f" - ln(CAST(nt + {_DSIR_B} AS DOUBLE))) * 1000000, 0) AS BIGINT)"
)

#: the shared WITH-chain through the per-doc weight table ``w`` — ONE
#: spelling serving both the ranking oracle ([q:curation_dsir_weights])
#: and the Gumbel-top-k selection oracle ([q:curation_dsir_sample]).
_DSIR_W_CTES = f"""tok AS (SELECT doc_id, lang,
                        unnest(string_split(text, ' ')) AS w
                 FROM documents),
    dbc AS (SELECT doc_id, lang,
                   ({duck_hex_int("md5(w)")}) % {_DSIR_B} AS b,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM tok GROUP BY 1, 2, 3),
    cs AS (SELECT b, CAST(SUM(cnt) AS BIGINT) AS cs FROM dbc GROUP BY 1),
    ct AS (SELECT b, CAST(SUM(cnt) AS BIGINT) AS ct FROM dbc
           WHERE lang = 'en' GROUP BY 1),
    tot AS (SELECT (SELECT CAST(SUM(cs) AS BIGINT) FROM cs) AS ns,
                   (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) FROM ct)
                     AS nt),
    lr AS (SELECT cs.b, {_DSIR_LR_MICRO} AS lr
           FROM (SELECT cs.b, cs.cs,
                        CAST(COALESCE(ct.ct, 0) AS BIGINT) AS ct
                 FROM cs LEFT JOIN ct ON ct.b = cs.b) cs
           CROSS JOIN tot),
    w AS (SELECT doc_id,
                 CAST(SUM(cnt * lr.lr) AS BIGINT) AS weight_micro,
                 CAST(SUM(cnt) AS BIGINT) AS n_tokens
          FROM dbc JOIN lr ON lr.b = dbc.b GROUP BY 1)"""

_DSIR_ORACLE = f"""
    WITH {_DSIR_W_CTES}
    SELECT d.doc_id, d.source, d.lang, w.n_tokens, w.weight_micro,
           round(CAST(w.weight_micro AS DOUBLE) / 1000000.0, 6) + 0.0
             AS logweight
    FROM w JOIN documents d ON d.doc_id = w.doc_id
    ORDER BY w.weight_micro DESC, d.doc_id
    LIMIT {_DSIR_TOPK}
    """


@query(
    "curation_dsir_weights",
    oracle=_DSIR_ORACLE,
    tags=("llm", "curation", "dsir", "importance-sampling"),
)
def q_curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): rank raw
    pretraining documents by how much they resemble a TARGET
    distribution, using hashed-feature bag-of-words language models —
    the published scalable alternative to training a quality classifier.
    Target here: the lang='en' slice of the corpus; raw: the whole
    corpus. Features are words hashed into a FIXED universe of
    ``_DSIR_B`` buckets (md5-derived, both engines spell the same
    bucket id); each corpus fits an add-1-smoothed unigram LM over
    buckets, and a document's log importance weight is

        sum_b cnt_b(doc) * ln( p_target(b) / p_raw(b) )

    Served: the top-20 documents by weight — the head of DSIR's
    resampling order (the deterministic core of the method; the paper
    adds Gumbel noise for sampled selection, a seeded variant of
    [q:curation_weighted_sample]'s A-Res machinery if wanted).

    Determinism/parity: the per-bucket log-ratio is computed ONCE per
    bucket as a micro-unit BIGINT (see ``_DSIR_LR_MICRO``), so per-doc
    weights are exact integer sums — order-independent, hash-stable —
    and the only doubles served are one final division and its 6-dp
    round.

    Scale shape: ONE corpus-sized exchange — the (doc, bucket) count
    table — feeds both LM count tables AND the per-doc scoring join
    (the r10 one-exchange lesson; persisted MEMORY_ONLY, it is
    |docs|x|distinct buckets per doc|, far smaller than the token
    stream). The LM tables are <= _DSIR_B rows by construction, the
    log-ratio table broadcasts at any corpus size, corpus totals ride a
    1-row broadcast, and the top-k is a TakeOrdered — no global sort.
    Reference anchor: the reference engine's map/reduce view pipeline
    (indexjs.go:73-191) has no curation surface; this extends the
    LLM-pipeline operator family the engine adds beyond reference
    parity."""
    w = _dsir_weight_frame(spark, sf_dir)
    return (
        w.select(
            "doc_id",
            "source",
            "lang",
            "n_tokens",
            "weight_micro",
            (
                F.round(F.col("weight_micro").cast("double") / 1000000.0, 6)
                + F.lit(0.0)
            ).alias("logweight"),
        )
        .orderBy(F.desc("weight_micro"), F.asc("doc_id"))
        .limit(_DSIR_TOPK)
    )


def _dsir_weight_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document DSIR importance-weight table (doc_id, source,
    lang, weight_micro, n_tokens) — the ONE Spark spelling shared by the
    ranking query and the Gumbel-top-k selection query (mirrors the
    shared ``_DSIR_W_CTES`` oracle chain)."""
    from pyspark import StorageLevel

    d = _t(spark, sf_dir, "documents")
    b = (
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
        % _DSIR_B
    ).alias("b")
    # source and lang ride the (doc, bucket) groupBy — functionally
    # dependent on doc_id, so the exchange cardinality is unchanged and
    # the final attach-metadata join (a docs-sized build side at corpus
    # scale) disappears from the plan entirely
    tok = d.select(
        "doc_id", "lang", "source", F.explode(F.split("text", " ")).alias("w")
    )
    dbc = (
        tok.select("doc_id", "lang", "source", b)
        .groupBy("doc_id", "lang", "source", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .persist(StorageLevel.MEMORY_ONLY)
    )
    cs = dbc.groupBy("b").agg(F.sum("cnt").cast("long").alias("cs"))
    ct = (
        dbc.where(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.sum("cnt").cast("long").alias("ct"))
    )
    tot = cs.agg(F.sum("cs").cast("long").alias("ns")).crossJoin(
        F.broadcast(
            ct.agg(F.coalesce(F.sum("ct"), F.lit(0)).cast("long").alias("nt"))
        )
    )
    lr = (
        cs.join(ct, "b", "left")
        .select("b", "cs", F.coalesce("ct", F.lit(0)).cast("long").alias("ct"))
        .crossJoin(F.broadcast(tot))
        .select("b", F.expr(_DSIR_LR_MICRO).alias("lr"))
    )
    return (
        dbc.join(lr, "b")
        .groupBy("doc_id", "source", "lang")
        .agg(
            F.sum(F.col("cnt") * F.col("lr")).cast("long").alias("weight_micro"),
            F.sum("cnt").cast("long").alias("n_tokens"),
        )
    )


# ==========================================================================
# round 13: Gopher-style quality + repetition gate
# ==========================================================================

#: Gopher rule constants (Rae et al. 2021, Table A1 / §A1.1), with the
#: corpus-calibrated adaptations STATED (the c4-gate precedent —
#: thresholds sit where a rule fails a real fraction of the generated
#: corpus, so both branches are exercised; each adaptation is named in
#: the docstring):
_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 50, 100_000  # published
_GOPHER_WL_LO, _GOPHER_WL_HI = 3, 10  # published (mean word length)
#: published list; membership requirement adapted to >=1 (published: >=2
#: — the synthetic vocabulary carries only 'the' from the list, so the
#: published floor would fail every document)
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
#: >=80% of words must contain an alphabetic character (published)
_GOPHER_ALPHA_NUM, _GOPHER_ALPHA_DEN = 4, 5
#: top-2-gram fraction ceiling as an exact rational (published 0.18 of
#: CHARACTERS; adapted to 1/8 of TOKEN instances — the corpus-calibrated
#: p90 — because the synthetic corpus' uniform word lengths make the
#: character and token fractions near-proportional)
_GOPHER_TOP2_NUM, _GOPHER_TOP2_DEN = 1, 8
#: duplicate-3-gram instance-fraction ceiling 1/50 (published thresholds
#: are character-based per n in 5..10; one representative token-based
#: rule at the corpus-calibrated p95 stands in for the family)
_GOPHER_DUP3_NUM, _GOPHER_DUP3_DEN = 1, 50
#: the ONE SQL spelling of the stopword list — both the oracle and the
#: Spark side interpolate it, so editing _GOPHER_STOPWORDS can never
#: fork the engines
_GOPHER_STOP_SQL = ",".join(f"'{s}'" for s in _GOPHER_STOPWORDS)

def gopher_repetition_exprs():
    """The gate's two repetition statistics as scan-local Columns over a
    token-array column ``w`` — run-length folds over the SORTED per-row
    gram array (the zero-shuffle spelling, see the query docstring):
    the accumulator walks runs of equal grams carrying (prev, current
    run length, best run length, singleton-run count); ``x <=> acc.prev``
    is null-safe so the NULL start sentinel and empty-string grams both
    behave, and the ``finish`` lambda closes the last run. Returns
    (most-repeated-bigram count, duplicated-trigram instance count).
    Module-level (not inline in the query) so the seeded fuzz test in
    tests/test_curation_ops.py drives the exact production expressions
    over degenerate inputs the corpus never produces."""

    def _sorted_grams(k: int) -> str:
        parts = ", ' ', ".join(f"element_at(w, i + {j})" for j in range(k))
        return (
            f"sort_array(CASE WHEN size(w) < {k} THEN array() "
            f"ELSE transform(sequence(1, size(w) - {k - 1}), "
            f"i -> concat({parts})) END)"
        )

    acc0 = (
        "named_struct('prev', CAST(NULL AS STRING), 'cur', 0L, "
        "'best', 0L, 'ones', 0L)"
    )
    merge = (
        "(acc, x) -> IF(x <=> acc.prev, "
        "named_struct('prev', x, 'cur', acc.cur + 1L, "
        "'best', greatest(acc.best, acc.cur + 1L), 'ones', acc.ones), "
        "named_struct('prev', x, 'cur', 1L, "
        "'best', greatest(acc.best, 1L), "
        "'ones', acc.ones + IF(acc.cur = 1L, 1L, 0L)))"
    )
    # most-repeated-bigram count: the longest run
    mc = F.expr(
        f"aggregate({_sorted_grams(2)}, {acc0}, {merge}, acc -> acc.best)"
    )
    # duplicated-trigram instances: total minus singleton-run count;
    # the total is pure arithmetic (|trigrams| = max(n-2, 0)), so the
    # sorted array is built exactly once per family
    dupi = F.expr(
        f"greatest(size(w) - 2, 0) - aggregate({_sorted_grams(3)}, "
        f"{acc0}, {merge}, acc -> acc.ones + IF(acc.cur = 1L, 1L, 0L))"
    )
    return mc, dupi


_GOPHER_ORACLE = f"""
    WITH d AS (SELECT doc_id, source, text, string_split(text, ' ') AS w,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n
               FROM documents),
    bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
                    i -> w[i] || ' ' || w[i + 1])) AS g
           FROM d),
    bgc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    top2 AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS mc FROM bgc
             GROUP BY 1),
    tg AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS g
           FROM d),
    tgc AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY 1, 2),
    dup3 AS (SELECT doc_id,
                    CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                      AS dupi,
                    CAST(SUM(c) AS BIGINT) AS toti
             FROM tgc GROUP BY 1),
    r AS (SELECT d.source,
            (n >= {_GOPHER_MIN_WORDS} AND n <= {_GOPHER_MAX_WORDS})
              AS ok_nwords,
            (length(text) - n + 1 >= {_GOPHER_WL_LO} * n
             AND length(text) - n + 1 <= {_GOPHER_WL_HI} * n)
              AS ok_wordlen,
            (len(list_filter(list_distinct(w), t -> t IN
               ({_GOPHER_STOP_SQL}))) >= 1)
              AS ok_stop,
            (CAST(len(list_filter(w,
                t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT)
               * {_GOPHER_ALPHA_DEN} >= {_GOPHER_ALPHA_NUM} * n)
              AS ok_alpha,
            (COALESCE(top2.mc, 0) * 2 * {_GOPHER_TOP2_DEN}
               <= {_GOPHER_TOP2_NUM} * n) AS ok_top2gram,
            (COALESCE(dup3.dupi, 0) * {_GOPHER_DUP3_DEN}
               <= {_GOPHER_DUP3_NUM} * COALESCE(dup3.toti, 1))
              AS ok_dup3gram
          FROM d
          LEFT JOIN top2 ON top2.doc_id = d.doc_id
          LEFT JOIN dup3 ON dup3.doc_id = d.doc_id)
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS docs,
      CAST(SUM(CASE WHEN ok_nwords AND ok_wordlen AND ok_stop AND ok_alpha
                     AND ok_top2gram AND ok_dup3gram
               THEN 1 ELSE 0 END) AS BIGINT) AS kept,
      CAST(SUM(CASE WHEN NOT ok_nwords THEN 1 ELSE 0 END) AS BIGINT)
        AS fail_nwords,
      CAST(SUM(CASE WHEN NOT ok_wordlen THEN 1 ELSE 0 END) AS BIGINT)
        AS fail_wordlen,
      CAST(SUM(CASE WHEN NOT ok_stop THEN 1 ELSE 0 END) AS BIGINT)
        AS fail_stop,
      CAST(SUM(CASE WHEN NOT ok_alpha THEN 1 ELSE 0 END) AS BIGINT)
        AS fail_alpha,
      CAST(SUM(CASE WHEN NOT ok_top2gram THEN 1 ELSE 0 END) AS BIGINT)
        AS fail_top2gram,
      CAST(SUM(CASE WHEN NOT ok_dup3gram THEN 1 ELSE 0 END) AS BIGINT)
        AS fail_dup3gram
    FROM r
    GROUP BY source
    ORDER BY source
    """


@query(
    "text_gopher_gate",
    oracle=_GOPHER_ORACLE,
    tags=("llm", "text", "curation", "quality", "gopher"),
)
def q_text_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality + repetition gate (Rae et al. 2021, §A1.1
    and Table A1 — the rule family MassiveText/RedPajama/Dolma-class
    pipelines run alongside C4's): six named boolean rules per document,
    per-source violation counts and the kept total. Complements
    [q:text_c4_style_gate] (C4's rules are length/diversity heuristics;
    Gopher adds the WITHIN-document repetition family that catches
    degenerate boilerplate cross-doc dedup never sees) and
    [q:dedup_boilerplate_prefix] (cross-doc templates).

    Rules (published values unless stated): word count in [50, 100k];
    mean word length in [3, 10]; >=1 of Gopher's 8 stopwords (published
    floor is 2 — adapted, the synthetic vocabulary carries only 'the'
    from the list); >=80% of words contain an alphabetic character;
    top-bigram token fraction <= 1/8 (published: 0.18 of characters —
    token-instance adaptation at the corpus p90); duplicate-trigram
    instance fraction <= 1/50 (representative of the published
    duplicate-n-gram character family, corpus p95). Every threshold is
    applied as an EXACT integer cross-multiplication — no float
    comparison can flake a borderline document differently across
    engines; rules that the synthetic corpus cannot fail (word length,
    alphabetic ratio) still compute genuinely and are reported.

    Scale shape: ZERO shuffles before the O(|sources|) rollup — the
    repetition statistics never leave the scan. A per-doc gram count
    table is a GROUP BY over the exploded gram stream (~2n string rows
    per doc through an exchange — measured 2.4 s at ~sf1, the shuffle
    serialization dominating); but "count of the most repeated bigram"
    and "instances in duplicated trigrams" are RUN-LENGTH statistics of
    the SORTED per-doc gram array, and the array lives in one row — so
    sort_array + one aggregate() fold per gram family computes both
    inside whole-stage codegen (measured 1.11 s at ~sf1 vs the exchange
    spelling's 2.39 s, see BASELINE.md r13). At 100 TB this is a pure
    scan: per-row work is O(g log g) on
    ~doc-length arrays, no exchange, no join, nothing keyed on doc_id
    at all. Zero Python UDFs."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "text",
        F.split("text", " ").alias("w"),
        F.size(F.split("text", " ")).cast("long").alias("n"),
    )
    mc, dupi = gopher_repetition_exprs()
    toti = F.greatest(F.col("n") - 2, F.lit(0))

    stop_arr = _GOPHER_STOP_SQL
    r = (
        d.withColumn("mc", mc.cast("long"))
        .withColumn("dupi", dupi.cast("long"))
        .withColumn("toti", toti.cast("long"))
        .select(
            "source",
            (
                (F.col("n") >= _GOPHER_MIN_WORDS)
                & (F.col("n") <= _GOPHER_MAX_WORDS)
            ).alias("ok_nwords"),
            (
                (F.length("text") - F.col("n") + 1 >= _GOPHER_WL_LO * F.col("n"))
                & (F.length("text") - F.col("n") + 1 <= _GOPHER_WL_HI * F.col("n"))
            ).alias("ok_wordlen"),
            (
                F.size(
                    F.expr(
                        f"filter(array_distinct(w), t -> t IN ({stop_arr}))"
                    )
                )
                >= 1
            ).alias("ok_stop"),
            (
                F.size(F.expr("filter(w, t -> t rlike '[a-zA-Z]')"))
                .cast("long")
                * _GOPHER_ALPHA_DEN
                >= _GOPHER_ALPHA_NUM * F.col("n")
            ).alias("ok_alpha"),
            # mc/dupi/toti are scan-local fold outputs and can NEVER be
            # NULL (the fuzz test covers empty gram arrays: they yield 0,
            # not NULL) — no coalesce here, so this can't silently
            # diverge from the oracle's LEFT-JOIN-side COALESCEs, whose
            # NULL branches are equally dead on the same invariant
            # (short docs have dupi = toti = 0, and 0·den <= num·0 and
            # 0·den <= num·1 agree). r13b review finding.
            (
                F.col("mc") * 2 * _GOPHER_TOP2_DEN
                <= _GOPHER_TOP2_NUM * F.col("n")
            ).alias("ok_top2gram"),
            (
                F.col("dupi") * _GOPHER_DUP3_DEN
                <= _GOPHER_DUP3_NUM * F.col("toti")
            ).alias("ok_dup3gram"),
        )
    )
    kept = (
        F.col("ok_nwords")
        & F.col("ok_wordlen")
        & F.col("ok_stop")
        & F.col("ok_alpha")
        & F.col("ok_top2gram")
        & F.col("ok_dup3gram")
    )

    def _fails(c: str):
        return (
            F.sum(F.when(~F.col(c), 1).otherwise(0))
            .cast("long")
            .alias(c.replace("ok_", "fail_"))
        )

    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("kept"),
            _fails("ok_nwords"),
            _fails("ok_wordlen"),
            _fails("ok_stop"),
            _fails("ok_alpha"),
            _fails("ok_top2gram"),
            _fails("ok_dup3gram"),
        )
        .orderBy("source")
    )


# ==========================================================================
# round 13b: fastText-style linear classifier gate (quality-classifier
# INFERENCE — the serving half of the GPT-3/CCNet/LLaMA filtering recipe)
# ==========================================================================

#: hashed-feature bucket universe for the classifier — same fixed-size
#: hashing-trick rationale as ``_DSIR_B`` (the model table is bounded at
#: _FT_B weights however large the corpus grows); kept as a separate
#: constant because the classifier's feature space (unigrams + adjacent
#: word bigrams, fastText's signature n-gram features) differs from
#: DSIR's unigram-only space.
_FT_B = 4096
#: frozen per-bucket weights span [-1000, +1000] MICRO-units: wspan=2001
#: odd so the weight distribution over buckets is exactly symmetric
#: around 0; on the generated corpus the gate keeps ~0.7-0.96 per source
#: and drops the rest, so both decision branches are exercised at every
#: test SF.
_FT_WSPAN = 2001


def _ft_spark_bucket(feat: str) -> str:
    """Spark-SQL bucket id of string feature expr ``feat`` — the fastText
    hashing trick into the fixed ``_FT_B`` universe; shared by the frozen
    weight formula and the learned-table variant so the two paths can
    never hash differently."""
    return (
        f"CAST(conv(substring(md5({feat}), 1, 8), 16, 10) AS BIGINT)"
        f" % {_FT_B}"
    )


def _ft_spark_weight(feat: str) -> str:
    """Spark-SQL micro-unit weight of string feature expr ``feat``: hash
    into one of ``_FT_B`` buckets (the fastText hashing trick), then the
    bucket's FROZEN weight — md5-derived from the bucket id under the
    'ftw:' domain-separation prefix, so the weight stream is independent
    of the bucket-assignment stream."""
    bucket = _ft_spark_bucket(feat)
    return (
        "CAST(conv(substring(md5(concat('ftw:', CAST(("
        + bucket
        + ") AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        f" % {_FT_WSPAN} - {_FT_WSPAN // 2}"
    )


def _ft_duck_weight(feat: str) -> str:
    """DuckDB spelling of the same weight chain (strpos-nibble idiom)."""
    bucket = f"({duck_hex_int(f'md5({feat})')}) % {_FT_B}"
    inner = duck_hex_int(f"md5('ftw:' || CAST(({bucket}) AS VARCHAR))")
    return f"(({inner}) % {_FT_WSPAN} - {_FT_WSPAN // 2})"


_FT_ORACLE = f"""
    WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS w
                 FROM documents),
    feats AS (
      SELECT doc_id, source, unnest(w) AS f FROM tok
      UNION ALL
      SELECT doc_id, source,
             unnest(list_transform(range(1, len(w)),
                    i -> w[i] || ' ' || w[i + 1])) AS f
      FROM tok),
    doc AS (SELECT doc_id, source,
              CAST(SUM({_ft_duck_weight('f')}) AS BIGINT) AS lm,
              CAST(COUNT(*) AS BIGINT) AS nf
            FROM feats GROUP BY 1, 2)
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN lm >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      round(CAST(SUM(CASE WHEN lm >= 0 THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE), 6) + 0.0 AS keep_rate,
      CAST(SUM(lm) AS BIGINT) AS logit_sum_micro,
      CAST(SUM(nf) AS BIGINT) AS n_feats
    FROM doc GROUP BY source ORDER BY source
    """


@query(
    "curation_fasttext_gate",
    oracle=_FT_ORACLE,
    tags=("llm", "curation", "classifier", "fasttext"),
    bench=True,  # r14: the borderline 3.13x ratio gets a per-round series (r13 verdict item 3)
)
def q_curation_fasttext_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear text-classifier quality gate — fastText-architecture
    INFERENCE (Joulin et al. 2016), the serving half of the quality
    classifiers the published pipelines filter with (GPT-3's
    WebText-vs-CommonCrawl classifier, Brown et al. 2020 §A; CCNet's and
    LLaMA's fastText filters). Features are word unigrams plus adjacent
    word bigrams (fastText's word n-grams) hashed into a FIXED universe
    of ``_FT_B`` buckets (the hashing trick — the model is a bounded
    weight table, never a vocabulary map); a document's logit is the sum
    of its features' bucket weights and the gate keeps documents whose
    MEAN feature weight is >= 0 — decided on the integer SUM (sign of
    the mean == sign of the sum), so no division enters the decision.

    The weights are a FROZEN deterministic checkpoint: weight(b) =
    md5-derived integer in [-1000, 1000] micro-units under a
    domain-separated hash (``_ft_spark_weight``). Training is out of
    scope by design — the operator demonstrates the scale-relevant half
    (distributed scoring of every document under a fixed model); a real
    deployment swaps the weight formula for a learned <= _FT_B-row table
    and the plan gains one bounded broadcast join, nothing else.

    Served: per source — docs, kept, keep rate, the exact micro-unit
    logit mass, and the feature count (the corpus-health dashboard a
    filtering run reports).

    Determinism/parity: per-document logits are SUMS OF INTEGERS
    (order-independent, the [q:curation_dsir_weights] micro-unit
    pattern); the only double served is the keep-rate division rounded
    to 6 dp. Both engines spell the identical md5→bucket→weight chain
    (conv vs strpos-nibble, the [q:curation_dsir_weights] parity
    precedent).

    Scale shape: classifier inference is embarrassingly parallel — the
    feature stream is one zero-shuffle Generate (explode), the weight
    chain runs INSIDE whole-stage codegen on each occurrence, and the
    per-document sum partial-aggregates map-side so the only exchanges
    are a |docs|-row (doc, source) hop and the |sources|-row rollup;
    zero joins (weights are derived in-expression — a learned model
    would add one <= _FT_B-row broadcast build and nothing else). Three
    spellings were measured at ~sf1 before this one was chosen
    (BASELINE.md r13b): a scan-local ``aggregate`` fold (zero exchange
    but the md5 chain runs in INTERPRETED lambda mode — 3.81 s), a
    run-length distinct-(feat,cnt) fold feeding a 5x-smaller explode
    (the accumulator's array_append copies made it 5.28 s), and this
    explode-through-codegen plan at 2.56 s.

    Reference anchor: the reference engine (indexjs.go:73-191) has no
    model-serving surface; this extends the LLM-pipeline curation family
    beyond reference parity."""
    tok = _ft_feature_stream(spark, sf_dir)
    scored = (
        tok.select("doc_id", "source", F.expr(_ft_spark_weight("f")).alias("w"))
        .groupBy("doc_id", "source")
        .agg(
            F.sum("w").cast("long").alias("lm"),
            F.count(F.lit(1)).cast("long").alias("nf"),
        )
    )
    return _ft_gate_rollup(scored)


def _ft_feature_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gate's feature stream — word unigrams + adjacent bigrams, one
    zero-shuffle explode; shared by the frozen-formula query and the
    learned-table variant."""
    d = _t(spark, sf_dir, "documents")
    ws = "split(text, ' ')"
    feats = f"concat({ws}, {spark_bigram_sql(ws)})"
    return d.select("doc_id", "source", F.explode(F.expr(feats)).alias("f"))


def _ft_gate_rollup(scored: DataFrame) -> DataFrame:
    """Per-source gate report over the per-document (lm, nf) logits —
    shared by both weight sources so the serving surface cannot fork."""
    keep = F.when(F.col("lm") >= 0, 1).otherwise(0)
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(keep).cast("long").alias("n_keep"),
            (
                F.round(
                    F.sum(keep).cast("double")
                    / F.count(F.lit(1)).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("keep_rate"),
            F.sum("lm").cast("long").alias("logit_sum_micro"),
            F.sum("nf").cast("long").alias("n_feats"),
        )
        .orderBy("source")
    )


def fasttext_gate_with_weights(
    spark: SparkSession, sf_dir: str, weights: DataFrame
) -> DataFrame:
    """The registered gate's "a learned model swaps in" claim, made
    EXECUTABLE (r13 verdict item 7): the identical gate plan with the
    md5-derived weight FORMULA replaced by a caller-supplied learned
    weight TABLE (columns ``bucket`` BIGINT in [0, _FT_B), ``w`` BIGINT
    micro-units — e.g. a trained fastText/perceptron checkpoint). The
    only plan change is the one promised in the query docstring: a
    bounded build-side join (<= _FT_B rows, planner-broadcast by size —
    never hinted, the round-12 rule); features hash to buckets through
    the SAME ``_ft_spark_bucket`` chain, buckets absent from the
    checkpoint score 0 (left join + coalesce — hashing-trick models are
    dense, but a pruned checkpoint must not drop documents), and the
    per-document sum / per-source rollup are the shared helpers.

    Not registered: the weight table is caller state, so there is no
    fixed DuckDB twin; tests/test_curation_ops.py proves the output
    against a pure-Python perceptron scored with the same weights."""
    tok = _ft_feature_stream(spark, sf_dir)
    bucketed = tok.select(
        "doc_id", "source", F.expr(_ft_spark_bucket("f")).alias("b")
    )
    scored = (
        bucketed.join(weights, bucketed["b"] == weights["bucket"], "left")
        .select(
            "doc_id",
            "source",
            F.coalesce(F.col("w"), F.lit(0)).cast("long").alias("w"),
        )
        .groupBy("doc_id", "source")
        .agg(
            F.sum("w").cast("long").alias("lm"),
            F.count(F.lit(1)).cast("long").alias("nf"),
        )
    )
    return _ft_gate_rollup(scored)


# ==========================================================================
# round 13b: DSIR Gumbel-top-k selection (the sampling half of DSIR)
# ==========================================================================

#: documents drawn by the Gumbel-top-k selection
_DSIR_SAMPLE_K = 30


@query(
    "curation_dsir_sample",
    oracle=f"""
    WITH {_DSIR_W_CTES},
    g AS (SELECT w.doc_id, d.source, w.n_tokens, w.weight_micro,
            round(CAST(w.weight_micro AS DOUBLE) / 1000000.0
                  - ln(-ln((CAST(({duck_hex_int(
                      "md5('dsg:' || CAST(w.doc_id AS VARCHAR))")})
                      AS DOUBLE) + 0.5) / 4294967296.0)), 6) + 0.0
              AS gumbel_key
          FROM w JOIN documents d ON d.doc_id = w.doc_id)
    SELECT doc_id, source, n_tokens, weight_micro, gumbel_key
    FROM g ORDER BY gumbel_key DESC, doc_id LIMIT {_DSIR_SAMPLE_K}
    """,
    tags=("llm", "curation", "dsir", "gumbel", "sampling"),
)
def q_curation_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR's SELECTION step — Gumbel-top-k sampling without replacement
    over the importance weights (Xie et al. NeurIPS'23 §2.3 select with
    Gumbel noise on the log importance weights; the Gumbel-top-k theorem
    — Vieira 2014, Kool et al. ICML'19 — makes the top-k of
    logweight + Gumbel an exact without-replacement draw with inclusion
    probability ∝ exp(logweight)). [q:curation_dsir_weights] RANKS the
    corpus; this DRAWS the training subset from it, completing the
    method: key = logweight − ln(−ln(u)) with u derived from the
    document id under a domain-separated hash ('dsg:' prefix) — the
    hash-derived-uniform design rule of [q:curation_weighted_sample]'s
    A-Res draw (which this generalizes: A-Res is the w-exponentiated
    special case), so the sample is a pure function of the corpus with
    no RNG state to coordinate.

    Determinism/parity: the weight table rides the SHARED integer-exact
    DSIR kernel (``_dsir_weight_frame`` ↔ ``_DSIR_W_CTES`` — one
    spelling per engine pair); the Gumbel chain is two ln's over an
    exactly-representable uniform, spelled identically on both sides,
    rounded to the 6-dp grid before the (gumbel_key DESC, doc_id)
    total order.

    Scale shape: identical to the weights query up to the ``w`` table
    (one corpus-sized (doc,bucket) exchange, ≤4096-row broadcast LMs);
    the Gumbel key is a scan-local expression over ``w`` and the draw is
    a TakeOrdered — per-partition heaps, one k-row merge, the corpus
    never globally sorted."""
    w = _dsir_weight_frame(spark, sf_dir)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("dsg:"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    gkey = (
        F.round(
            F.col("weight_micro").cast("double") / 1000000.0
            - F.log(-F.log(u)),
            6,
        )
        + F.lit(0.0)
    )
    return (
        w.select(
            "doc_id",
            "source",
            "n_tokens",
            "weight_micro",
            gkey.alias("gumbel_key"),
        )
        .orderBy(F.desc("gumbel_key"), F.asc("doc_id"))
        .limit(_DSIR_SAMPLE_K)
    )


# ==========================================================================
# round 14: SoftDedup duplication-aware reweighting
# ==========================================================================

#: reweighting sharpness (the paper's alpha knob: 0 = no reweighting;
#: higher = harder suppression of common text). 0.5 keeps every weight
#: strictly positive and the weight span modest on this corpus.
def bigram_fold_frame(d: DataFrame, keys: tuple[str, ...]) -> DataFrame:
    """The scan-LOCAL per-doc (gram, c) fold (r14 verdict item 3), spelled
    ONCE for every bigram-LM consumer ([q:curation_soft_dedup_weights],
    [q:curation_moore_lewis_select]): sort the row's bigram array and
    run-length encode it INSIDE the row (two codegen projections, zero
    shuffle), so one row per DISTINCT gram per doc leaves the scan
    instead of one per occurrence. The LM probe joins then carry the
    folded stream — the corpus's gram-repetition factor never reaches
    the broadcast-hash probe — and the LM build's map-side hash sums
    pre-counted ``c`` instead of hashing every occurrence. Exact-integer
    identical to the per-occurrence spelling: n_grams = SUM(c),
    sum_lp = SUM(c·lpm). Returns ``keys + (gram, c)``."""
    ws = "split(text, ' ')"
    return (
        d.select(
            *keys,
            F.expr(f"array_sort({spark_bigram_sql(ws)})").alias("gs"),
        )
        .select(
            *keys,
            "gs",
            F.expr(
                "CASE WHEN size(gs) = 0 THEN array() ELSE"
                " filter(sequence(1, size(gs)),"
                " i -> i = 1 OR element_at(gs, i) != element_at(gs, i - 1))"
                " END"
            ).alias("st"),
        )
        .select(
            *keys,
            F.explode(
                F.expr(
                    "transform(st, (p, j) -> struct("
                    "element_at(gs, p) AS gram,"
                    " CAST(coalesce(try_element_at(st, j + 2), size(gs) + 1)"
                    " - p AS BIGINT) AS c))"
                )
            ).alias("gc"),
        )
        .select(*keys, F.col("gc.gram").alias("gram"),
                F.col("gc.c").alias("c"))
    )


_SD_ALPHA = "0.5"

#: micro-unit per-gram log-probability — the DSIR integer-grid rule:
#: round once per VOCABULARY entry, then every per-doc statistic is an
#: exact integer sum.
_SD_LP = "CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(tt AS DOUBLE)) * 1000000, 0) AS BIGINT)"

_SD_ORACLE = f"""
    WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS w
                FROM documents),
    big AS (SELECT doc_id, source,
              unnest(list_transform(range(1, len(w)),
                     i -> w[i] || ' ' || w[i + 1])) AS gram
            FROM tk),
    c2 AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt FROM big GROUP BY 1),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tt FROM c2),
    lp AS (SELECT gram, {_SD_LP} AS lpm FROM c2 CROSS JOIN tot),
    d AS (SELECT b.doc_id, b.source,
            CAST(COUNT(*) AS BIGINT) AS n_grams,
            CAST(SUM(lp.lpm) AS BIGINT) AS sum_lp
          FROM big b JOIN lp USING (gram) GROUP BY 1, 2),
    m AS (SELECT CAST(SUM(sum_lp) AS DOUBLE) / CAST(SUM(n_grams) AS DOUBLE)
            AS corpus_mean FROM d),
    wt AS (SELECT doc_id, source, n_grams,
             CAST(round(exp(-{_SD_ALPHA} * (CAST(sum_lp AS DOUBLE)
                    / CAST(n_grams AS DOUBLE) - corpus_mean) / 1000000.0)
                  * 1000000, 0) AS BIGINT) AS w_micro
           FROM d CROSS JOIN m)
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_grams) AS BIGINT) AS raw_grams,
      CAST(SUM(w_micro) AS BIGINT) AS weight_mass_micro,
      CAST(SUM(w_micro * n_grams) AS BIGINT) AS effective_grams_micro,
      round(CAST(SUM(w_micro * n_grams) AS DOUBLE)
            / (1000000.0 * CAST(SUM(n_grams) AS DOUBLE)), 6) + 0.0
        AS effective_ratio
    FROM wt GROUP BY source ORDER BY source
    """


@query(
    "curation_soft_dedup_weights",
    oracle=_SD_ORACLE,
    tags=("llm", "curation", "dedup", "reweighting"),
    bench=True,  # r15: the r14 round's adverse ratio gets a per-round series (r14 verdict item 4)
)
def q_curation_soft_dedup_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SoftDedup duplication-aware reweighting (He et al., ACL 2024:
    instead of HARD-dropping near-duplicate text, downweight each
    sample by its n-gram "commonness" so the training distribution is
    deduplicated in expectation while no data is discarded): per-doc
    commonness = mean corpus log-probability of its word bigrams, and
    sampling weight w = exp(−alpha·(commonness − corpus mean)) — docs
    more common than average (the near-dup mass the hard pipelines
    [q:dedup_apply_keep_best] would delete) get w < 1, rare docs w > 1.
    Served per source: doc count, raw bigram mass, the micro-unit
    weight mass, the weighted (effective) gram mass, and the effective
    ratio — the "how much does soft dedup shrink this source in
    expectation" dashboard, the soft complement of the hard APPLY
    ledgers.

    Determinism/parity: the DSIR integer-grid discipline end-to-end —
    per-gram log-probs rounded ONCE on the vocabulary table to exact
    micro BIGINTs, per-doc sums exact, the corpus mean ONE division of
    two exact integer sums, each doc's weight ONE identical exp chain
    rounded to a micro integer, and every served aggregate an exact
    integer sum (the only served double is the final ratio, rounded to
    the 6-dp grid).

    Scale shape: ONE read-bandwidth corpus pass, zero corpus-sized
    exchanges: the scan-LOCAL per-doc (gram, c) fold — an in-row sort +
    run-length encode, zero shuffle, one row per DISTINCT gram per doc,
    never one per occurrence (the KN fold, moved one join earlier; r14
    verdict item 3) — is PERSISTED and feeds BOTH the LM build and the
    scoring probe (the KN one-exchange lesson; the two-pass spelling
    re-paid the split+explode scan, measured 10.2 → 5.7 s at ~sf1).
    The log-prob table is
    vocabulary-sized and PERSISTED (so the planner sees its true size
    and broadcasts the scoring probe; at 100 TB: per-partition after
    the heavy-hitter cut), the per-doc sums partial-aggregate map-side
    into a |docs|-row hop, the corpus mean is a 1-row broadcast, and
    the rollup carries |sources| rows.

    Reference anchor: the reference engine (indexjs.go:73-191) has no
    curation surface; this extends the LLM-pipeline curation family
    beyond reference parity."""
    from pyspark import StorageLevel

    d = _t(spark, sf_dir, "documents")
    # the shared scan-local per-doc (gram, c) fold (see bigram_fold_frame),
    # PERSISTED so the LM build and the scoring probe read ONE corpus
    # pass (the KN one-exchange lesson, applied to a zero-exchange fold:
    # the two-pass spelling re-paid the split+explode scan — measured
    # 10.2 s two-pass vs 5.7 s persisted at ~sf1, uncached). MEMORY_ONLY:
    # evictable under pressure, lineage replays from the scan.
    fold = bigram_fold_frame(d, ("doc_id", "source")).persist(
        StorageLevel.MEMORY_ONLY
    )
    # the vocabulary LM is persisted so (a) tot/lp derive from it
    # without re-running the corpus wordcount (the un-persisted spelling
    # re-ran the explode three times: 10.6 s at ~sf1) and (b) the cached
    # relation reports its TRUE vocabulary size, so the planner
    # broadcasts the scoring join (the post-aggregate size estimate
    # otherwise inherits the corpus-sized child and plans a corpus
    # shuffle: the dgc-exchange spelling measured 4.5 s; this one 3.6 s
    # — BASELINE.md r14). Result: two read-bandwidth corpus passes, a
    # broadcast probe, and a map-side-combined |docs|-row hop.
    c2 = (
        fold.groupBy("gram")
        .agg(F.sum("c").cast("long").alias("cnt"))
        .persist(StorageLevel.MEMORY_ONLY)
    )
    tot = c2.agg(F.sum("cnt").cast("long").alias("tt"))
    lp = c2.crossJoin(F.broadcast(tot)).selectExpr(
        "gram", f"{_SD_LP} AS lpm"
    )
    dd = (
        fold.join(lp, "gram")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.col("c") * F.col("lpm")).cast("long").alias("sum_lp"),
        )
    )
    m = dd.agg(
        (
            F.sum("sum_lp").cast("double") / F.sum("n_grams").cast("double")
        ).alias("corpus_mean")
    )
    wt = dd.crossJoin(F.broadcast(m)).selectExpr(
        "source",
        "n_grams",
        f"CAST(round(exp(-{_SD_ALPHA} * (CAST(sum_lp AS DOUBLE)"
        " / CAST(n_grams AS DOUBLE) - corpus_mean) / 1000000.0)"
        " * 1000000, 0) AS BIGINT) AS w_micro",
    )
    return (
        wt.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_grams").cast("long").alias("raw_grams"),
            F.sum("w_micro").cast("long").alias("weight_mass_micro"),
            F.sum(F.col("w_micro") * F.col("n_grams"))
            .cast("long")
            .alias("effective_grams_micro"),
            (
                F.round(
                    F.sum(F.col("w_micro") * F.col("n_grams")).cast("double")
                    / (F.lit(1000000.0) * F.sum("n_grams").cast("double")),
                    6,
                )
                + F.lit(0.0)
            ).alias("effective_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# round 15: Moore-Lewis cross-entropy difference selection
# ---------------------------------------------------------------------------

#: the in-domain seed: the English slice of the corpus stands in for
#: Moore-Lewis's in-domain corpus (real pipelines bring a curated seed
#: set; the LM machinery is what the operator contributes).
_ML_LANG = "en"
_ML_TOPK = 20

#: the two add-one-smoothed micro-unit bigram log-probs, spelled ONCE for
#: both engines over the exact-BIGINT columns (ca = corpus gram count,
#: ci = in-domain gram count, ta/ti = the two token totals, v = shared
#: vocabulary size): ONE addition, ONE division, ONE ln, rounded ONCE
#: per vocabulary entry to an exact micro BIGINT — the DSIR integer-grid
#: rule ([q:curation_dsir_weights]).
_ML_LPG = (
    "CAST(round(ln((CAST(ca AS DOUBLE) + 1.0)"
    " / CAST(ta + v AS DOUBLE)) * 1000000, 0) AS BIGINT)"
)
_ML_LPI = (
    "CAST(round(ln((CAST(ci AS DOUBLE) + 1.0)"
    " / CAST(ti + v AS DOUBLE)) * 1000000, 0) AS BIGINT)"
)

#: the served per-token cross-entropy difference: ONE subtraction of two
#: exact integer sums, ONE division — identical IEEE chain either engine,
#: so the ORDER BY over it is bit-stable (doc_id breaks exact ties).
_ML_SCORE = (
    "CAST(sum_lp_gen - sum_lp_in AS DOUBLE) / CAST(n_grams AS DOUBLE)"
)

_ML_ORACLE = f"""
    WITH tk AS (SELECT doc_id, lang, string_split(text, ' ') AS w
                FROM documents),
    big AS (SELECT doc_id, lang,
              unnest(list_transform(range(1, len(w)),
                     i -> w[i] || ' ' || w[i + 1])) AS gram
            FROM tk),
    c2 AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN lang = '{_ML_LANG}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ci
           FROM big GROUP BY 1),
    tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS ta,
                   CAST(SUM(ci) AS BIGINT) AS ti,
                   CAST(COUNT(*) AS BIGINT) AS v
            FROM c2),
    lp AS (SELECT gram, {_ML_LPG} AS lpg, {_ML_LPI} AS lpi
           FROM c2 CROSS JOIN tot),
    d AS (SELECT b.doc_id, b.lang,
            CAST(COUNT(*) AS BIGINT) AS n_grams,
            CAST(SUM(lp.lpi) AS BIGINT) AS sum_lp_in,
            CAST(SUM(lp.lpg) AS BIGINT) AS sum_lp_gen
          FROM big b JOIN lp USING (gram) GROUP BY 1, 2)
    SELECT doc_id, lang, n_grams, sum_lp_in, sum_lp_gen,
           round({_ML_SCORE} / 1000000.0, 6) + 0.0 AS ml_score
    FROM d
    ORDER BY {_ML_SCORE}, doc_id
    LIMIT {_ML_TOPK}
    """


@query(
    "curation_moore_lewis_select",
    oracle=_ML_ORACLE,
    tags=("llm", "curation", "selection", "moore-lewis"),
)
def q_curation_moore_lewis_select(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Moore-Lewis cross-entropy difference selection (Moore & Lewis,
    ACL 2010 — the classic intelligent-selection rule behind most
    domain-adaptation pipelines, and the method DSIR
    [q:curation_dsir_weights] generalizes): score every document by
    H_in(doc) − H_gen(doc), the difference between its per-token cross
    entropy under an IN-DOMAIN language model and under the
    general-corpus language model, and keep the lowest scorers — text
    that looks like the target domain but not like average text. Serves
    the top-20 most in-domain-like documents with their exact
    integer LM sums and the served score.

    Both LMs are add-one-smoothed word-bigram models over the SHARED
    corpus vocabulary (in-domain = the English slice), so every scored
    gram has a probability in both — the standard smoothing choice for
    the method's OOV edge.

    Determinism/parity: the DSIR integer grid end-to-end — both
    log-probs rounded ONCE per vocabulary entry to micro BIGINTs
    (shared ``_ML_LPG``/``_ML_LPI`` spellings), per-doc sums exact
    integers, and the ranking key ONE subtraction + ONE division of
    exact integers (identical IEEE chain both engines; doc_id breaks
    ties).

    Scale shape: the [q:curation_soft_dedup_weights] posture — ONE
    read-bandwidth corpus pass: the shared scan-local
    ``bigram_fold_frame`` (zero-shuffle per-doc run-length fold) is
    persisted and feeds both sides, ONE vocabulary-sized exchange
    builds BOTH LMs (conditional aggregates, not two passes), the
    persisted vocabulary table broadcasts into the scoring probe, a
    map-side-combined |docs|-row hop, and a top-k TakeOrdered heap.

    Reference anchor: the reference engine (indexjs.go:73-191) has no
    curation surface; this extends the LLM-pipeline curation family
    beyond reference parity."""
    from pyspark import StorageLevel

    d = _t(spark, sf_dir, "documents")
    # persisted for the same one-corpus-pass reason as the SoftDedup twin
    fold = bigram_fold_frame(d, ("doc_id", "lang")).persist(
        StorageLevel.MEMORY_ONLY
    )
    c2 = (
        fold.groupBy("gram")
        .agg(
            F.sum("c").cast("long").alias("ca"),
            F.sum(
                F.when(F.col("lang") == _ML_LANG, F.col("c")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("ci"),
        )
        .persist(StorageLevel.MEMORY_ONLY)
    )
    tot = c2.agg(
        F.sum("ca").cast("long").alias("ta"),
        F.sum("ci").cast("long").alias("ti"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    lp = c2.crossJoin(F.broadcast(tot)).selectExpr(
        "gram", f"{_ML_LPG} AS lpg", f"{_ML_LPI} AS lpi"
    )
    dd = (
        fold.join(lp, "gram")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.col("c") * F.col("lpi")).cast("long").alias("sum_lp_in"),
            F.sum(F.col("c") * F.col("lpg")).cast("long").alias("sum_lp_gen"),
        )
    )
    return (
        dd.select(
            "doc_id",
            "lang",
            "n_grams",
            "sum_lp_in",
            "sum_lp_gen",
            (
                F.round(F.expr(_ML_SCORE) / F.lit(1000000.0), 6) + F.lit(0.0)
            ).alias("ml_score"),
        )
        .orderBy(F.expr(_ML_SCORE), "doc_id")
        .limit(_ML_TOPK)
    )


# ---------------------------------------------------------------------------
# round 15: UniMax per-source sampling budgets
# ---------------------------------------------------------------------------

#: maximum epochs any source may repeat (UniMax's N hyperparameter) and
#: the total budget as a fraction of the corpus (numerator/denominator —
#: exact integer arithmetic end-to-end).
_UM_EPOCHS = 2
_UM_BUDGET_NUM, _UM_BUDGET_DEN = 3, 2

_UM_ORACLE = f"""
    WITH t AS (SELECT lang,
                 CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS n_tokens
               FROM documents GROUP BY 1),
    b AS (SELECT CAST(SUM(n_tokens) * {_UM_BUDGET_NUM}
                      // {_UM_BUDGET_DEN} AS BIGINT) AS budget,
                 CAST(COUNT(*) AS BIGINT) AS ns
          FROM t),
    o AS (SELECT t.*, b.budget, b.ns,
            CAST(row_number() OVER (ORDER BY n_tokens, lang) AS BIGINT)
              AS i,
            CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY n_tokens, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cumlt
          FROM t CROSS JOIN b),
    f AS (SELECT o.*,
            ({_UM_EPOCHS} * n_tokens * (ns - i + 1)
             <= budget - {_UM_EPOCHS} * cumlt) AS cnd
          FROM o),
    k AS (SELECT COALESCE(MIN(CASE WHEN NOT cnd THEN i END),
                          MAX(ns) + 1) - 1 AS kk
          FROM f),
    caps AS (SELECT CAST(COALESCE(SUM(CASE WHEN i <= k.kk
                      THEN {_UM_EPOCHS} * n_tokens END), 0) AS BIGINT)
               AS capsum
             FROM f CROSS JOIN k),
    u AS (SELECT CASE WHEN b.ns - k.kk > 0
                 THEN CAST((b.budget - caps.capsum) // (b.ns - k.kk)
                           AS BIGINT)
                 ELSE CAST(0 AS BIGINT) END AS share
          FROM b CROSS JOIN k CROSS JOIN caps)
    SELECT f.lang, f.n_tokens,
           CAST({_UM_EPOCHS} * f.n_tokens AS BIGINT) AS cap_tokens,
           CAST(CASE WHEN f.i <= k.kk THEN {_UM_EPOCHS} * f.n_tokens
                ELSE u.share END AS BIGINT) AS alloc_tokens,
           round(CAST(CASE WHEN f.i <= k.kk
                      THEN {_UM_EPOCHS} * f.n_tokens
                      ELSE u.share END AS DOUBLE)
                 / CAST(f.n_tokens AS DOUBLE), 6) + 0.0 AS epochs_served
    FROM f CROSS JOIN k CROSS JOIN u
    ORDER BY lang
    """


@query(
    "curation_unimax_budgets",
    oracle=_UM_ORACLE,
    tags=("llm", "curation", "sampling", "unimax", "mixture"),
)
def q_curation_unimax_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax per-language sampling budgets (Chung et al., ICLR 2023 —
    the uniform-coverage language-sampling rule used for mT5-class
    mixtures, replacing temperature sampling; languages are the paper's
    allocation unit): given a total token budget (3/2 of the corpus —
    an oversampled multilingual run) and a per-language repeat cap of N
    epochs, allocate by water-filling — scan languages SMALLEST FIRST;
    a language is capped at N·|language| when
    even its full cap fits under an equal split of what remains,
    otherwise it (and every larger language) gets the equal share of the
    remaining budget. Serves per language: token count, cap, allocated
    tokens, and the epochs actually served — the mixture table a
    pretraining run consumes.

    The ascending scan makes the capped set a PREFIX (the water-filling
    argument in the paper's Algorithm 1), so the sequential loop
    collapses to window cumsums + one argmin — no recursion, no
    iteration, pure relational algebra.

    Determinism/parity: every quantity is an exact BIGINT (token counts,
    caps, cumulative sums, the prefix test E·n·(remaining
    sources) ≤ budget − E·prefix_sum, and the floor-division
    equal share); the only served double is epochs_served, ONE division
    rounded to the 6-dp grid.

    Scale shape: ONE map-side-combined |languages|-row aggregate leaves
    the corpus scan (token counts fold per-row via size(split())); every
    later step — windows, the prefix argmin, the shares — runs on the
    |languages|-row table (metadata at any corpus size; the windows are
    bounded, not corpus windows).

    Reference anchor: the reference engine (indexjs.go:73-191) has no
    curation surface; this extends the LLM-pipeline curation family
    beyond reference parity."""
    d = _t(spark, sf_dir, "documents")
    t = (
        d.select(
            "lang",
            F.size(F.split("text", " ")).cast("long").alias("ntok"),
        )
        .groupBy("lang")
        .agg(F.sum("ntok").cast("long").alias("n_tokens"))
    )
    b = t.agg(
        F.expr(
            f"CAST(SUM(n_tokens) * {_UM_BUDGET_NUM}"
            f" div {_UM_BUDGET_DEN} AS BIGINT)"
        ).alias("budget"),
        F.count(F.lit(1)).cast("long").alias("ns"),
    )
    wo = Window.orderBy("n_tokens", "lang")
    o = (
        t.crossJoin(F.broadcast(b))
        .withColumn("i", F.row_number().over(wo).cast("long"))
        .withColumn(
            "cumlt",
            F.coalesce(
                F.sum("n_tokens").over(
                    wo.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
    )
    f = o.withColumn(
        "cnd",
        F.lit(_UM_EPOCHS) * F.col("n_tokens") * (F.col("ns") - F.col("i") + 1)
        <= F.col("budget") - F.lit(_UM_EPOCHS) * F.col("cumlt"),
    )
    k = f.agg(
        (
            F.coalesce(
                F.min(F.when(~F.col("cnd"), F.col("i"))),
                F.max("ns") + 1,
            )
            - 1
        )
        .cast("long")
        .alias("kk")
    )
    caps = (
        f.crossJoin(F.broadcast(k))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("i") <= F.col("kk"),
                        F.lit(_UM_EPOCHS) * F.col("n_tokens"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("capsum"),
            F.max("kk").cast("long").alias("kk"),
            F.max("budget").cast("long").alias("budget"),
            F.max("ns").cast("long").alias("ns"),
        )
        .withColumn(
            "share",
            F.when(
                F.col("ns") - F.col("kk") > 0,
                F.expr("CAST((budget - capsum) div (ns - kk) AS BIGINT)"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .select("kk", "share")
    )
    alloc = F.when(
        F.col("i") <= F.col("kk"),
        (F.lit(_UM_EPOCHS) * F.col("n_tokens")).cast("long"),
    ).otherwise(F.col("share"))
    return (
        f.crossJoin(F.broadcast(caps))
        .select(
            "lang",
            "n_tokens",
            (F.lit(_UM_EPOCHS) * F.col("n_tokens"))
            .cast("long")
            .alias("cap_tokens"),
            alloc.cast("long").alias("alloc_tokens"),
            (
                F.round(
                    alloc.cast("double") / F.col("n_tokens").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("epochs_served"),
        )
        .orderBy("lang")
    )

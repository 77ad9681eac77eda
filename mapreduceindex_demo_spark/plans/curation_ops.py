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

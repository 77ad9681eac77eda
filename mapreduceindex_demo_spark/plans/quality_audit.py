"""Declarative data-quality constraint audit (round 8b) — the Deequ /
Great-Expectations operator class: a named suite of constraints
(completeness, key uniqueness, value ranges, accepted values, referential
integrity) evaluated against a table in as few passes as the constraint
algebra allows, emitting one row per check with its observed metric and an
exact pass/fail.

Every serious ingestion pipeline runs this gate before data reaches
training or indexing; the reference repo has no audit surface (it trusts
its mutation feed, SURVEY §2.1), so like the curation family this is
engine-completeness work.

Determinism: every metric is a ratio of two BIGINT counts computed in one
double division rounded to 6dp; every pass/fail is decided on the EXACT
integer counts (``c_unique * 1000 >= n * 999``), never on the rounded
double — so the verdict can't flip on an ulp even if the displayed metric
sits on a rounding boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceindex_demo_spark.plans.registry import query
from mapreduceindex_demo_spark.session import load_table

_AUDIT_ORACLE = """
    WITH agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(l_returnflag) AS BIGINT) AS c_nonnull,
             CAST(COUNT(DISTINCT CASE
               WHEN l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
               THEN (l_orderkey, l_linenumber) END) AS BIGINT) AS c_unique,
             CAST(SUM(CASE WHEN l_discount >= 0 AND l_discount <= 0.1
                           THEN 1 ELSE 0 END) AS BIGINT) AS c_range,
             CAST(SUM(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS c_qty,
             CAST(SUM(CASE WHEN l_returnflag IN ('A', 'N', 'R')
                           THEN 1 ELSE 0 END) AS BIGINT) AS c_accept
      FROM lineitem),
    ref AS (SELECT CAST(COUNT(*) AS BIGINT) AS c_matched
            FROM lineitem l
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)),
    m AS (SELECT * FROM agg CROSS JOIN ref)
    SELECT 'completeness_l_returnflag' AS check_name,
           round(CAST(c_nonnull AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0
             AS metric,
           CAST(1.0 AS DOUBLE) AS threshold, (c_nonnull = n) AS pass FROM m
    UNION ALL
    SELECT 'uniqueness_orderkey_linenumber',
           round(CAST(c_unique AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0,
           CAST(0.999 AS DOUBLE), (c_unique * 1000 >= n * 999) FROM m
    UNION ALL
    SELECT 'range_l_discount_0_to_0.1',
           round(CAST(c_range AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0,
           CAST(1.0 AS DOUBLE), (c_range = n) FROM m
    UNION ALL
    SELECT 'min_l_quantity_positive',
           round(CAST(c_qty AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0,
           CAST(1.0 AS DOUBLE), (c_qty = n) FROM m
    UNION ALL
    SELECT 'accepted_values_l_returnflag',
           round(CAST(c_accept AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0,
           CAST(1.0 AS DOUBLE), (c_accept = n) FROM m
    UNION ALL
    SELECT 'refint_orderkey_in_orders',
           round(CAST(c_matched AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0,
           CAST(1.0 AS DOUBLE), (c_matched = n) FROM m
    """


@query(
    "quality_constraint_audit",
    oracle=_AUDIT_ORACLE,
    tags=("quality", "audit", "constraints", "deequ"),
)
def q_quality_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-constraint quality audit of ``lineitem``: returnflag
    completeness, (orderkey, linenumber) key uniqueness at a 99.9%
    threshold, discount in [0, 0.1], positive quantity, returnflag in
    {A, N, R}, and orderkey referential integrity against ``orders`` —
    one row per check with the observed ratio and an exact verdict. On
    the synthetic testdata the uniqueness check genuinely FAILS (the
    generator reuses line numbers), so the audit exercises both verdict
    branches.

    Scale shape: the five single-table constraints fold into ONE
    aggregate over one scan — conditional SUMs ride the map-side partial,
    and the only extra exchange is count-distinct's standard two-phase
    expansion on the key pair. Referential integrity is a semi-join
    counted on the fact side (at 100 TB: shuffled on orderkey, or a
    broadcast/Bloom probe when the dimension fits — the
    [q:sketch_bloom_prune] path). The check fan-out at the end is a
    1-row ``stack``, not data. Deequ computes its metric suites with
    exactly this shared-scan shape."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    agg = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("l_returnflag").cast("long").alias("c_nonnull"),
        F.countDistinct("l_orderkey", "l_linenumber")
        .cast("long")
        .alias("c_unique"),
        F.sum(
            F.when(
                (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.1), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("c_range"),
        F.sum(F.when(F.col("l_quantity") > 0, 1).otherwise(0))
        .cast("long")
        .alias("c_qty"),
        F.sum(
            F.when(F.col("l_returnflag").isin("A", "N", "R"), 1).otherwise(0)
        )
        .cast("long")
        .alias("c_accept"),
    )
    ref = (
        li.select("l_orderkey")
        .join(orders, li.l_orderkey == orders.o_orderkey, "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("c_matched"))
    )
    m = agg.crossJoin(F.broadcast(ref))

    def _metric(cnt: str) -> str:
        return f"round(CAST({cnt} AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0"

    return m.selectExpr(
        f"""stack(6,
          'completeness_l_returnflag', {_metric('c_nonnull')}, 1.0D,
            c_nonnull = n,
          'uniqueness_orderkey_linenumber', {_metric('c_unique')}, 0.999D,
            c_unique * 1000 >= n * 999,
          'range_l_discount_0_to_0.1', {_metric('c_range')}, 1.0D,
            c_range = n,
          'min_l_quantity_positive', {_metric('c_qty')}, 1.0D,
            c_qty = n,
          'accepted_values_l_returnflag', {_metric('c_accept')}, 1.0D,
            c_accept = n,
          'refint_orderkey_in_orders', {_metric('c_matched')}, 1.0D,
            c_matched = n
        ) AS (check_name, metric, threshold, pass)"""
    )


#: PSI bin count (the industry-standard 10 equi-width bins)
_PSI_BINS = 10

_PSI_ORACLE = f"""
    WITH span AS (SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2
                    AS mid_us,
                  MIN(value) AS vmin, MAX(value) AS vmax FROM events),
    obs AS (SELECT CAST(LEAST({_PSI_BINS - 1},
                   CAST(floor((value - vmin) / (vmax - vmin)
                              * {_PSI_BINS}.0) AS BIGINT)) AS INTEGER)
                     AS bin,
                   CASE WHEN epoch_us(ts) < mid_us THEN 1 ELSE 0 END
                     AS is_exp
            FROM events CROSS JOIN span),
    c AS (SELECT bin, CAST(SUM(is_exp) AS BIGINT) AS ce,
                 CAST(COUNT(*) - SUM(is_exp) AS BIGINT) AS ca
          FROM obs GROUP BY 1),
    spine AS (SELECT CAST(unnest(range(0, {_PSI_BINS})) AS INTEGER) AS bin),
    filled AS (SELECT s.bin, COALESCE(ce, 0) AS expected_cnt,
                      COALESCE(ca, 0) AS actual_cnt
               FROM spine s LEFT JOIN c ON c.bin = s.bin),
    t AS (SELECT bin, expected_cnt, actual_cnt,
                 SUM(expected_cnt) OVER () AS te,
                 SUM(actual_cnt) OVER () AS ta FROM filled),
    x AS (SELECT bin, expected_cnt, actual_cnt,
                 CAST(expected_cnt + 1 AS DOUBLE)
                   / CAST(te + {_PSI_BINS} AS DOUBLE) AS p,
                 CAST(actual_cnt + 1 AS DOUBLE)
                   / CAST(ta + {_PSI_BINS} AS DOUBLE) AS q
          FROM t),
    y AS (SELECT bin, expected_cnt, actual_cnt,
                 round((p - q) * ln(p / q), 6) + 0.0 AS psi_contrib
          FROM x),
    z AS (SELECT bin, expected_cnt, actual_cnt, psi_contrib,
                 SUM(CAST(round(psi_contrib * 1000000.0) AS BIGINT))
                   OVER () AS tot_micro FROM y)
    SELECT bin, expected_cnt, actual_cnt, psi_contrib,
           round(CAST(tot_micro AS DOUBLE) / 1000000.0, 6) + 0.0
             AS psi_total
    FROM z ORDER BY bin
    """


@query(
    "quality_psi_drift",
    oracle=_PSI_ORACLE,
    tags=("quality", "drift", "psi", "monitoring"),
)
def q_quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the stream's first and second
    halves (split at the timestamp midpoint) over 10 equi-width value
    bins — the credit-risk-standard drift monitor
    (``PSI = sum (p_i - q_i) * ln(p_i / q_i)``; < 0.1 stable, > 0.25
    shifted) that complements the KL-based TOKEN drift family
    ([q:text_unigram_drift]) with the NUMERIC-feature drift every
    model-serving pipeline watches.

    Determinism: the period split is integer epoch-microsecond
    arithmetic; bin edges derive from the global min/max in one shared
    1-row aggregate, so the binning expression is a pure function both
    engines evaluate identically; zero bins are Laplace-smoothed with
    integer +1 pseudo-counts (never an epsilon constant); each bin's
    contribution is exact-integer ratios through one ln; and the suite
    total folds 6-dp micro-unit INTEGERS, so no float summation order
    exists.

    Scale shape: one 1-row span broadcast, ONE conditional-sum combiner
    groupBy over the fact stream (10 groups — the map-side partial
    collapses each task to <= 10 rows), a 10-row spine left join, and
    10-row windows. At 100 TB the plan is a single scan at memory
    bandwidth; everything after the partial aggregate is constant-size.
    The streaming twin keys the same rollup by arrival day
    ([q:streaming_drift_daily])."""
    e = load_table(spark, sf_dir, "events").select("ts", "value")
    span = e.agg(
        F.expr("(unix_micros(MIN(ts)) + unix_micros(MAX(ts))) div 2").alias(
            "mid_us"
        ),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    b = _PSI_BINS
    obs = e.crossJoin(F.broadcast(span)).select(
        F.least(
            F.lit(b - 1),
            F.floor(
                (F.col("value") - F.col("vmin"))
                / (F.col("vmax") - F.col("vmin"))
                * F.lit(float(b))
            ),
        )
        .cast("int")
        .alias("bin"),
        F.when(F.unix_micros("ts") < F.col("mid_us"), 1)
        .otherwise(0)
        .alias("is_exp"),
    )
    c = obs.groupBy("bin").agg(
        F.sum("is_exp").alias("ce"),
        (F.count(F.lit(1)) - F.sum("is_exp")).alias("ca"),
    )
    spine = spark.range(0, b).select(F.col("id").cast("int").alias("bin"))
    filled = spine.join(c, "bin", "left").select(
        "bin",
        F.coalesce("ce", F.lit(0)).alias("expected_cnt"),
        F.coalesce("ca", F.lit(0)).alias("actual_cnt"),
    )
    w_all = Window.partitionBy()
    p = (F.col("expected_cnt") + 1).cast("double") / (
        F.sum("expected_cnt").over(w_all) + F.lit(b)
    ).cast("double")
    q = (F.col("actual_cnt") + 1).cast("double") / (
        F.sum("actual_cnt").over(w_all) + F.lit(b)
    ).cast("double")
    y = filled.select(
        "bin",
        "expected_cnt",
        "actual_cnt",
        (F.round((p - q) * F.log(p / q), 6) + F.lit(0.0)).alias("psi_contrib"),
    )
    tot = F.sum(
        F.round(F.col("psi_contrib") * F.lit(1000000.0)).cast("long")
    ).over(Window.partitionBy())
    return y.select(
        "bin",
        "expected_cnt",
        "actual_cnt",
        "psi_contrib",
        (F.round(tot.cast("double") / F.lit(1000000.0), 6) + F.lit(0.0)).alias(
            "psi_total"
        ),
    ).orderBy("bin")

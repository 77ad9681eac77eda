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

from pyspark.sql import DataFrame, SparkSession
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

"""Correlated-subquery / EXISTS / IN query suite (SURVEY §2.4 A6 — the
decorrelation surface; TPC-H Q2/Q14/Q17/Q18/Q22 shapes adapted to the
testdata schema, which has no partsupp/commitdate columns).

The reference pushes every per-document computation into user JS and has
no relational subquery surface at all (SURVEY §2.4); these queries exist
so the engine covers the decorrelated-join plans Catalyst produces for
scalar/EXISTS/IN subqueries. Each DataFrame build is the *decorrelated*
form (aggregate-then-join / semi-join / anti-join — what survives 100 TB),
while the DuckDB oracle states the same query with an explicit subquery,
proving the plans agree.

Determinism follows the registry conventions: exact decimal sums surfaced
as double, single double divisions in a fixed operation order, policy
rounding for unavoidable double math, total tiebreak order under LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceindex_demo_spark.operators.relational import MONEY, RATE, dec, dsum
from mapreduceindex_demo_spark.plans.registry import query
from mapreduceindex_demo_spark.session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Correlated scalar aggregate over the fact table (TPC-H Q17 shape)
# --------------------------------------------------------------------------


@query(
    "small_qty_revenue_by_brand",
    oracle="""
    SELECT p_brand,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        AS small_qty_revenue,
      COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand IN ('Brand#1', 'Brand#2')
      AND l_quantity < (
        SELECT (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                * CAST(0.2 AS DOUBLE)) / CAST(COUNT(*) AS DOUBLE)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    GROUP BY p_brand
    """,
    tags=("join", "subquery", "correlated", "agg"),
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue from lineitems whose quantity is below 20% of the
    part's average quantity — a correlated scalar AVG subquery.

    Decorrelated build: one groupBy over lineitem computes every part's
    threshold (single shuffle on l_partkey, partial agg map-side), then a
    join back to lineitem. The part dimension filter broadcasts. At 100 TB
    the threshold table is |parts| rows — orders of magnitude smaller than
    the fact — so the join-back is the cheap edge.
    """
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#1", "Brand#2")
    ).select("p_partkey", "p_brand")
    thr = li.groupBy("l_partkey").agg(
        (
            (F.sum(dec("l_quantity")).cast("double") * F.lit(0.2))
            / F.count(F.lit(1)).cast("double")
        ).alias("thr")
    ).withColumnRenamed("l_partkey", "t_partkey")
    return (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .join(thr, li.l_partkey == thr.t_partkey)
        .where(F.col("l_quantity") < F.col("thr"))
        .groupBy("p_brand")
        .agg(
            dsum("l_extendedprice", "small_qty_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# IN (grouped HAVING subquery) — TPC-H Q18 shape
# --------------------------------------------------------------------------


@query(
    "large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
      strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      o_totalprice,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("join", "subquery", "in", "topk"),
    bench=True,
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: customers whose orders exceed 250 total quantity — an IN
    subquery with a grouped HAVING.

    The decorrelated build computes per-order quantity ONCE (one shuffle on
    l_orderkey) and reuses it both as the IN filter and as the output
    aggregate — the SQL's second lineitem scan disappears. The build side
    (the selective HAVING keeps ~1% of orders) carries NO explicit
    broadcast hint: a hint can never be demoted, and that side still grows
    linearly with scale factor, so forcing it trades the static
    misestimate (Catalyst's file-size stats undercounting orders and
    hashing the fact table — measured 512 MiB at ~sf3, 3.5 s → 8.9 s for
    3× data) for a guaranteed OOM further out. Instead the session's
    split thresholds decide: the conservative static threshold keeps both
    sides off the broadcast path at planning time, then AQE's 64 MB
    adaptive threshold broadcasts the filtered agg from its MEASURED
    runtime bytes — and degrades to a shuffle join exactly when the build
    side outgrows the gate. That is the shape that survives any scale-up.
    """
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    qty = li.groupBy("l_orderkey").agg(F.sum(dec("l_quantity")).alias("qdec"))
    big = qty.where(F.col("qdec") > F.lit(250).cast(MONEY))
    return (
        od.join(big, od.o_orderkey == big.l_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            F.col("qdec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Correlated MIN over a derived table (TPC-H Q2 shape, lineitem as partsupp)
# --------------------------------------------------------------------------


@query(
    "min_offer_supplier_per_part",
    oracle="""
    WITH offers AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
        MIN(l_extendedprice / l_quantity) AS offer
      FROM lineitem GROUP BY 1, 2)
    SELECT p_partkey, p_brand, s_suppkey, s_name,
      offer AS best_unit_price
    FROM offers
    JOIN part ON p_partkey = pk
    JOIN supplier ON s_suppkey = sk
    WHERE p_size <= 5
      AND offer = (SELECT MIN(o2.offer) FROM offers o2 WHERE o2.pk = offers.pk)
    """,
    tags=("join", "subquery", "correlated", "topk"),
)
def q_min_offer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each small part, the supplier(s) offering the minimum
    observed unit price — a correlated MIN subquery over a derived table
    (lineitem stands in for partsupp; ties keep all suppliers, so the
    result is deterministic without an arbitrary pick).

    Decorrelated build: groupBy (part, supp) → window MIN over part →
    filter equality. Two exchanges, but both move only *aggregated* rows:
    the first shuffles map-side-combined (part, supp, min) partials, the
    second re-keys that already-small result by part — the raw fact table
    is never shuffled. MIN of per-row double divisions is exact — no
    accumulation, so the equality filter is safe.
    """
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part").where(F.col("p_size") <= 5).select(
        "p_partkey", "p_brand"
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    offers = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("offer"))
    w = Window.partitionBy("pk")
    best = offers.withColumn("min_offer", F.min("offer").over(w)).where(
        F.col("offer") == F.col("min_offer")
    )
    return (
        best.join(pt, best.pk == pt.p_partkey)
        .join(sup, best.sk == sup.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            F.col("offer").alias("best_unit_price"),
        )
    )


# --------------------------------------------------------------------------
# Correlated scalar AVG over the same table (Q22-adjacent)
# --------------------------------------------------------------------------


@query(
    "suppliers_above_nation_avg",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier s
    WHERE s_acctbal > (
      SELECT CAST(SUM(CAST(s2.s_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE)
      FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey)
    """,
    tags=("subquery", "correlated", "window"),
)
def q_suppliers_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers with above-nation-average account balance — the classic
    self-correlated scalar AVG, decorrelated into a single window pass
    (one shuffle on the correlation key, no self-join, skew-safe)."""
    sup = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey")
    nation_avg = (
        F.sum(dec("s_acctbal")).over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double")
    )
    return (
        sup.withColumn("navg", nation_avg)
        .where(F.col("s_acctbal") > F.col("navg"))
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    )


# --------------------------------------------------------------------------
# EXISTS + NOT EXISTS (semi-join + anti-join)
# --------------------------------------------------------------------------


@query(
    "churned_customer_segments",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS churned
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01')
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
    tags=("subquery", "exists", "semi", "anti", "agg"),
)
def q_churned_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment count of churned customers: ordered in 1996, silent
    since 2000 — EXISTS becomes a LEFT SEMI join, NOT EXISTS a LEFT ANTI
    join. Both join sides carry their date filter pushed to the scan, and
    both shuffles hash on the same key (o_custkey), so AQE coalesces them
    into one exchange reuse at scale.
    """
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    active_96 = od.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    active_00 = od.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cu.join(active_96, cu.c_custkey == active_96.o_custkey, "left_semi")
        .join(active_00, cu.c_custkey == active_00.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("churned"))
    )


# --------------------------------------------------------------------------
# Conditional aggregate share (TPC-H Q14 shape)
# --------------------------------------------------------------------------


@query(
    "promo_revenue_share_monthly",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
      round((CAST(100 AS DOUBLE) * CAST(SUM(CASE WHEN p_type = 'PROMO'
          THEN CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE))
        / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
          AS DOUBLE), 6) AS promo_share
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    tags=("join", "agg", "conditional"),
)
def q_promo_share_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: monthly % of revenue from PROMO parts — a conditional
    aggregate ratio. Both numerator and denominator are exact decimal sums
    folded in ONE aggregation pass (no second scan, no subquery); the part
    dimension broadcasts onto the date-pruned fact scan."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    one = F.lit(1).cast(RATE)
    disc_price = dec("l_extendedprice") * (one - dec("l_discount", RATE))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    )
    total = F.sum(disc_price)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(pt, li.l_partkey == pt.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                (F.lit(100).cast("double") * promo.cast("double"))
                / total.cast("double"),
                6,
            ).alias("promo_share")
        )
    )


# --------------------------------------------------------------------------
# Skew-aware join (operators/skew.py) — driver-checked equivalence
# --------------------------------------------------------------------------


@query(
    "skew_salted_join_volume",
    oracle="""
    WITH skewed AS (
      SELECT CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE l_suppkey END AS k,
             l_quantity
      FROM lineitem)
    SELECT s_name,
      COUNT(*) AS n_lines,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM skewed JOIN supplier ON s_suppkey = k
    GROUP BY s_name
    """,
    tags=("join", "skew", "salted"),
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join under a pathological key distribution (half of all
    lineitems hammer supplier 1 — the celebrity-key case). The salt splits
    the hot key across 8 sub-tasks; the oracle is the PLAIN join, proving
    the de-skewed plan is semantics-preserving. Salt values come from
    rand() but never reach the result."""
    from mapreduceindex_demo_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("k"),
        "l_quantity",
    )
    sup = _t(spark, sf_dir, "supplier").withColumnRenamed("s_suppkey", "k")
    return (
        salted_join(li, sup, on="k", salts=8)
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_quantity", "sum_qty"),
        )
    )

"""Pattern-mining and forensic-audit operators (round 8, fourth session).

Four operator classes the engine's analytics surface was still missing:

- **Frequent-itemset mining** (`basket_frequent_pairs`): the a-priori
  market-basket class — co-occurring item pairs above an absolute minsup
  floor (Agrawal-Srikant's original formulation), scored with lift. The canonical MapReduce-era workload the
  reference's map/reduce surface gestures at (SURVEY §2.2 M1/M2) but
  never ships as a query.
- **Change-point detection** (`events_changepoint_scan`): per-series
  mean-shift localisation via a sliding two-window contrast — the
  monitoring twin of the PSI/KL drift family, answering WHEN a metric
  moved rather than whether two periods differ.
- **Chi-squared feature selection** (`text_chisq_feature_select`): the
  classic supervised term-selection statistic over document frequencies —
  the feature-engineering step between the token-stats family and any
  downstream classifier.
- **Benford first-digit audit** (`quality_benford_audit`): the forensic
  digit-distribution test — does a monetary column's leading-digit
  histogram follow Benford's law — rounding out the quality family's
  constraint/PSI audits with a fraud-detection staple.

All four are exact-arithmetic plans: counts are BIGINT, every ratio is
one IEEE double division of exact integers rounded to 6dp, suite totals
fold micro-unit integers, and every top-k has a total tiebreak order —
the registry's determinism conventions (plans/registry.py docstring).
"""

from __future__ import annotations

import math

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceindex_demo_spark.plans.registry import query
from mapreduceindex_demo_spark.session import load_table

# --------------------------------------------------------------------------
# basket_frequent_pairs
# --------------------------------------------------------------------------

#: an item is "frequent" if it appears in >= this many baskets — the
#: classic ABSOLUTE minsup of Agrawal-Srikant. Round 8 shipped a relative
#: floor (c * 500 >= n); measured against TPC-H-shaped data that is a
#: scale BUG, not a lever: the part universe grows linearly with SF while
#: each part's basket count stays ~30 at every SF, so the relative floor
#: admits half the items at sf0.01 and ZERO at sf0.1+ (and the ~sf1
#: replica harness therefore timed an empty output — r8 verdict items
#: "What's missing #4"/"next #6"). Absolute minsup is scale-stable here
#: and is the original formulation.
_ITEM_MIN_COUNT = 32
#: pairs below this absolute co-occurrence count are noise, not patterns
#: (the classic minsup floor); the SCALE lever is the item-level prune
#: above, which bounds the pair-generation fan-out
_PAIR_MIN_COUNT = 2

_BASKET_ORACLE = f"""
    WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                   FROM lineitem),
    no AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM items),
    ic AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY 1),
    freq AS (SELECT pk, c FROM ic WHERE c >= {_ITEM_MIN_COUNT}),
    fi AS (SELECT i.ok, i.pk FROM items i
           WHERE EXISTS (SELECT 1 FROM freq f WHERE f.pk = i.pk)),
    pairs AS (SELECT a.pk AS p1, b.pk AS p2, CAST(COUNT(*) AS BIGINT) AS pc
              FROM fi a JOIN fi b ON a.ok = b.ok AND a.pk < b.pk
              GROUP BY 1, 2),
    scored AS (
      SELECT p1, p2, pc,
             round(CAST(pc AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0
               AS support,
             round((CAST(pc AS DOUBLE) * CAST(n AS DOUBLE))
                   / (CAST(f1.c AS DOUBLE) * CAST(f2.c AS DOUBLE)), 6) + 0.0
               AS lift
      FROM pairs
      JOIN freq f1 ON f1.pk = p1
      JOIN freq f2 ON f2.pk = p2
      CROSS JOIN no
      WHERE pc >= {_PAIR_MIN_COUNT})
    SELECT p1, p2, pc AS pair_count, support, lift
    FROM scored ORDER BY pair_count DESC, p1, p2 LIMIT 20
    """


@query(
    "basket_frequent_pairs",
    oracle=_BASKET_ORACLE,
    tags=("mining", "itemsets", "apriori", "basket"),
    bench=True,
)
def q_basket_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori frequent-pair mining over order baskets: the top-20
    co-purchased part pairs above an absolute minsup floor, scored with
    lift (``P(ab) / (P(a)P(b))``) — the market-basket workload
    (Agrawal-Srikant) every co-occurrence recommender starts from.

    Determinism: support counts are BIGINT; the item and pair floors are
    integer min-counts (absolute minsup — the Agrawal-Srikant original;
    see the `_ITEM_MIN_COUNT` note for why a relative floor is a scale
    bug on data whose item universe grows with volume); support and
    lift are single IEEE divisions of exact integers rounded to 6dp; the
    top-20 orders on (pair_count DESC, p1, p2) — a total order.

    Scale shape (round 10: ONE corpus-sized exchange): the raw scan
    shuffles once on the basket key and `collect_set` dedups (ok, pk)
    inside that exchange; item supports partial-combine off the cached
    basket arrays (item-universe-sized partials); the a-priori prune is
    the point — only items above the minsup floor enter pair generation,
    so the per-basket ordered-pair fan-out (sort_array + slice/transform
    array combinatorics, whole-stage codegen, no self-join) is bounded
    by the FREQUENT-item basket width, single digits here; the
    frequent-item and basket-count sides are vocabulary-sized/1-row —
    AQE broadcasts them. At 100 TB nothing materialises beyond the
    (frequent-pair × basket) stream into one partial-aggregated groupBy.
    The classic second a-priori round (triples from frequent pairs,
    [q:basket_frequent_triples]) keeps the within-basket equi-join
    shape."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE corpus-sized exchange total (round 10; the r9 spelling paid a
    # standalone 60M-row (ok, pk) DISTINCT exchange — stage-profiled as
    # the plan's whole residual vs DuckDB — and then re-shuffled fi on ok
    # for the self-join): shuffle the raw scan ONCE on the basket key and
    # let the per-basket collect_set do the (ok, pk) dedup inside that
    # exchange's aggregation. Every downstream consumer — basket count,
    # item supports, the pair self-join — reads the persisted arrays
    # ALREADY co-located on ok, so the self-join plans with zero further
    # corpus-sized exchanges (plan test pins it).
    baskets = (
        li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .groupBy("ok")
        .agg(F.collect_set("pk").alias("pks"))
        .persist(StorageLevel.MEMORY_ONLY)
    )
    no = baskets.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # item supports: explode the cached arrays, partial-combine map-side —
    # the exchange carries per-partition (pk, count) partials, item-
    # universe-sized, never the corpus
    ic = (
        baskets.select(F.explode("pks").alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # freq feeds THREE legs (the fb semi-join and both scoring joins) —
    # persisted per the triples-query lesson (measured 6.44 -> 3.92 s at
    # ~sf1 in r9, before the r10 array respelling took it to 1.84 s)
    freq = ic.where(F.col("c") >= _ITEM_MIN_COUNT).persist(
        StorageLevel.MEMORY_ONLY
    )
    # per-basket FREQUENT-item arrays: explode the cached baskets, prune
    # by the broadcast semi-join, re-collect — every step stays on the
    # hash(ok) partitioning, zero exchanges
    fb = (
        baskets.select("ok", F.explode("pks").alias("pk"))
        .join(freq.select("pk"), "pk", "left_semi")
        .groupBy("ok")
        .agg(F.sort_array(F.collect_set("pk")).alias("fpks"))
    )
    # ordered pairs by ARRAY combinatorics instead of a self-join (r10;
    # the join spelling re-sorted the exploded corpus on both sides):
    # sort_array makes x < y positional, fan-out is bounded by the
    # frequent basket width choose 2 — single digits after the a-priori
    # prune — and generation is whole-stage codegen straight into the
    # partial pair-count aggregate
    pair_structs = F.expr(
        "flatten(transform(fpks, (x, i) -> "
        "transform(slice(fpks, i + 2, size(fpks)), "
        "y -> struct(x AS p1, y AS p2))))"
    )
    pairs = (
        fb.select(F.explode(pair_structs).alias("pr"))
        .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .agg(F.count(F.lit(1)).cast("long").alias("pc"))
    )
    f1 = freq.select(F.col("pk").alias("p1"), F.col("c").alias("c1"))
    f2 = freq.select(F.col("pk").alias("p2"), F.col("c").alias("c2"))
    scored = (
        pairs.join(f1, "p1")
        .join(f2, "p2")
        .crossJoin(F.broadcast(no))
        .where(F.col("pc") >= _PAIR_MIN_COUNT)
        .select(
            "p1",
            "p2",
            F.col("pc").alias("pair_count"),
            (
                F.round(F.col("pc").cast("double") / F.col("n").cast("double"), 6)
                + F.lit(0.0)
            ).alias("support"),
            (
                F.round(
                    (F.col("pc").cast("double") * F.col("n").cast("double"))
                    / (F.col("c1").cast("double") * F.col("c2").cast("double")),
                    6,
                )
                + F.lit(0.0)
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("pair_count"), "p1", "p2").limit(20)


# --------------------------------------------------------------------------
# basket_frequent_triples — a-priori round 2 (round 9)
# --------------------------------------------------------------------------

#: item floor: an event type is frequent in >= 1/20 (5%) of user-day
#: baskets; pair floor 1/50 (2%); triple floor 1/100 (1%). RELATIVE floors
#: are correct HERE (contrast `_ITEM_MIN_COUNT`): behavioral mixes
#: replicate with volume — more users exhibit the same per-user patterns —
#: so per-itemset support is a scale-invariant fraction of baskets, where
#: lineitem's part universe grows with scale and dilutes any ratio.
_TRI_ITEM_DEN = 20
_TRI_PAIR_DEN = 50
_TRI_DEN = 100

#: NOTE the MATERIALIZED hints and join-based (not EXISTS) level-2 prune:
#: fi feeds five consumers and fp three — without materialization DuckDB
#: re-inlines the whole distinct+aggregate chain per reference, and the
#: triple-EXISTS spelling blew past 7 MINUTES at ~sf1 (800k fi rows)
#: where this join spelling runs in seconds. fp rows are UNIQUE (x, y)
#: pairs, so inner joins preserve multiplicity exactly like EXISTS.
_TRIPLES_ORACLE = f"""
    WITH fi0 AS MATERIALIZED (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type AS it
        FROM events),
    nb AS (SELECT CAST(COUNT(DISTINCT (user_id, d)) AS BIGINT) AS n
           FROM fi0),
    ic AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS c FROM fi0 GROUP BY 1),
    fitems AS (SELECT it FROM ic CROSS JOIN nb
               WHERE c * {_TRI_ITEM_DEN} >= n),
    fi AS MATERIALIZED (
        SELECT f.user_id, f.d, f.it FROM fi0 f
        JOIN fitems w ON w.it = f.it),
    pc AS (SELECT a.it AS x, b.it AS y, CAST(COUNT(*) AS BIGINT) AS c
           FROM fi a JOIN fi b
             ON a.user_id = b.user_id AND a.d = b.d AND a.it < b.it
           GROUP BY 1, 2),
    fp AS MATERIALIZED (
        SELECT x, y FROM pc CROSS JOIN nb
        WHERE c * {_TRI_PAIR_DEN} >= n),
    tc AS (SELECT a.it AS e1, b.it AS e2, c3.it AS e3,
                  CAST(COUNT(*) AS BIGINT) AS tc
           FROM fi a
           JOIN fi b ON a.user_id = b.user_id AND a.d = b.d
                    AND a.it < b.it
           JOIN fp p1 ON p1.x = a.it AND p1.y = b.it
           JOIN fi c3 ON a.user_id = c3.user_id AND a.d = c3.d
                     AND b.it < c3.it
           JOIN fp p2 ON p2.x = a.it AND p2.y = c3.it
           JOIN fp p3 ON p3.x = b.it AND p3.y = c3.it
           GROUP BY 1, 2, 3)
    SELECT e1, e2, e3, tc AS triple_count,
           round(CAST(tc AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 AS support
    FROM tc CROSS JOIN nb
    WHERE tc * {_TRI_DEN} >= n
    ORDER BY triple_count DESC, e1, e2, e3
    """


@query(
    "basket_frequent_triples",
    oracle=_TRIPLES_ORACLE,
    tags=("mining", "itemsets", "apriori", "basket", "triples"),
)
def q_basket_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori ROUND 2 — frequent triples from frequent pairs, the
    level-wise step that gives the algorithm its name (Agrawal-Srikant
    VLDB'94 §2.1.1 candidate generation): an itemset of size 3 can only
    be frequent if ALL THREE of its size-2 subsets are, so the triple
    count touches only baskets and item combinations that survived round
    1. Domain: behavioral itemsets — which event-type combinations
    co-occur within a user-day basket — with relative support floors
    (scale-invariant for behavioral data; the `_TRI_ITEM_DEN` note
    contrasts this with the pairs query's absolute floor).

    Scale shape: the same join shape as [q:basket_frequent_pairs], one
    level deeper — the three-way within-basket self-join is an equi-join
    chain on the basket key whose fan-out is bounded by the FREQUENT-item
    basket width (level-1 prune), and each added leg is filtered by a
    frequent-PAIR semi-join before aggregation (level-2 prune), so the
    enumerated-triples stream is candidate-bounded, never the raw
    within-basket cube. Item/pair tables are item-universe-sized — AQE
    broadcasts them; the basket-count side is 1 row. At 100 TB the
    level-wise prune is what keeps round k affordable: the candidate set
    shrinks geometrically while the per-basket join stays linear in
    surviving items."""
    ev = load_table(spark, sf_dir, "events")
    # distinct (basket, item) feeds four consumers (item counts, pair
    # counts, and two extra legs of the triple join) — cache it once
    # (MEMORY_ONLY: evictable, never unpersisted — the triangle rule)
    fi0 = (
        ev.select(
            "user_id",
            F.to_date("ts").alias("d"),
            F.col("event_type").alias("it"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_ONLY)
    )
    nb = fi0.agg(
        F.countDistinct(F.struct("user_id", "d")).cast("long").alias("n")
    )
    ic = fi0.groupBy("it").agg(F.count(F.lit(1)).cast("long").alias("c"))
    fitems = (
        ic.crossJoin(F.broadcast(nb))
        .where(F.col("c") * _TRI_ITEM_DEN >= F.col("n"))
        .select("it")
    )
    # fi feeds FIVE join legs (two pair sides, three triple sides) — an
    # unpersisted fi re-ran the semi-join subtree per leg and the query
    # executed 89 jobs at ~sf1 (stage-profiled round 9); with fi and fp
    # cached it is ~11. Both are small: fi is basket-item-sized, fp is
    # <= C(|items|, 2) rows. (MEMORY_ONLY: the shared-frame rule — pays
    # for small frames, inverts for corpus-sized ones; BASELINE.md r9.)
    fi = fi0.join(fitems, "it", "left_semi").persist(StorageLevel.MEMORY_ONLY)
    pc = (
        fi.alias("a")
        .join(
            fi.alias("b"),
            [
                F.col("a.user_id") == F.col("b.user_id"),
                F.col("a.d") == F.col("b.d"),
                F.col("a.it") < F.col("b.it"),
            ],
        )
        .groupBy(F.col("a.it").alias("x"), F.col("b.it").alias("y"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # fp feeds the three level-2 semi-joins — without the persist each leg
    # re-ran the ENTIRE pair-counting chain (fi self-join + groupBy)
    fp = (
        pc.crossJoin(F.broadcast(nb))
        .where(F.col("c") * _TRI_PAIR_DEN >= F.col("n"))
        .select("x", "y")
        .persist(StorageLevel.MEMORY_ONLY)
    )
    triples = (
        fi.alias("a")
        .join(
            fi.alias("b"),
            [
                F.col("a.user_id") == F.col("b.user_id"),
                F.col("a.d") == F.col("b.d"),
                F.col("a.it") < F.col("b.it"),
            ],
        )
        .join(
            fi.alias("c3"),
            [
                F.col("a.user_id") == F.col("c3.user_id"),
                F.col("a.d") == F.col("c3.d"),
                F.col("b.it") < F.col("c3.it"),
            ],
        )
        .select(
            F.col("a.it").alias("e1"),
            F.col("b.it").alias("e2"),
            F.col("c3.it").alias("e3"),
        )
    )
    # the three level-2 semi-joins: every size-2 subset must be frequent
    for lhs, rhs in (("e1", "e2"), ("e1", "e3"), ("e2", "e3")):
        triples = triples.join(
            F.broadcast(fp),
            (F.col(lhs) == F.col("x")) & (F.col(rhs) == F.col("y")),
            "left_semi",
        )
    tc = triples.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).cast("long").alias("tc")
    )
    return (
        tc.crossJoin(F.broadcast(nb))
        .where(F.col("tc") * _TRI_DEN >= F.col("n"))
        .select(
            "e1",
            "e2",
            "e3",
            F.col("tc").alias("triple_count"),
            (
                F.round(F.col("tc").cast("double") / F.col("n").cast("double"), 6)
                + F.lit(0.0)
            ).alias("support"),
        )
        .orderBy(F.desc("triple_count"), "e1", "e2", "e3")
    )


# --------------------------------------------------------------------------
# events_changepoint_scan
# --------------------------------------------------------------------------

#: window half-width in days: contrast the 7 days before each day against
#: the 7 days starting at it
_CP_W = 7

_CHANGEPOINT_ORACLE = f"""
    WITH span AS (SELECT CAST(MIN(ts) AS DATE) AS d0,
                         CAST(MAX(ts) AS DATE) AS d1 FROM events),
    days AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d
             FROM span),
    types AS (SELECT DISTINCT event_type FROM events),
    spine AS (SELECT event_type, CAST(d AS DATE) AS d
              FROM types CROSS JOIN days),
    obs AS (SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2),
    grid AS (SELECT s.event_type, s.d, COALESCE(o.cnt, 0) AS cnt
             FROM spine s LEFT JOIN obs o
               ON o.event_type = s.event_type AND o.d = s.d),
    win AS (SELECT event_type, d, cnt,
                   SUM(cnt) OVER (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN {_CP_W} PRECEDING AND 1 PRECEDING)
                     AS before_sum,
                   COUNT(*) OVER (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN {_CP_W} PRECEDING AND 1 PRECEDING)
                     AS before_n,
                   SUM(cnt) OVER (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN CURRENT ROW AND {_CP_W - 1} FOLLOWING)
                     AS after_sum,
                   COUNT(*) OVER (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN CURRENT ROW AND {_CP_W - 1} FOLLOWING)
                     AS after_n
            FROM grid),
    full_w AS (SELECT * FROM win
               WHERE before_n = {_CP_W} AND after_n = {_CP_W}),
    ranked AS (SELECT event_type, d, before_sum, after_sum,
                      row_number() OVER (PARTITION BY event_type
                        ORDER BY abs(after_sum - before_sum) DESC, d)
                        AS rk
               FROM full_w)
    SELECT event_type, strftime(d, '%Y-%m-%d') AS shift_day,
           round(CAST(before_sum AS DOUBLE) / {_CP_W}.0, 6) + 0.0
             AS before_daily_avg,
           round(CAST(after_sum AS DOUBLE) / {_CP_W}.0, 6) + 0.0
             AS after_daily_avg,
           round(CAST(after_sum - before_sum AS DOUBLE) / {_CP_W}.0, 6) + 0.0
             AS shift
    FROM ranked WHERE rk = 1 ORDER BY event_type
    """


@query(
    "events_changepoint_scan",
    oracle=_CHANGEPOINT_ORACLE,
    tags=("timeseries", "changepoint", "monitoring", "events"),
)
def q_events_changepoint_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-shift change-point localisation per event_type: on a dense
    daily spine of event counts, score every day by the contrast between
    the 7 days before it and the 7 days starting at it (two framed window
    sums), and report each series' strongest shift point with the
    before/after daily averages — answering WHEN a metric moved, where
    the PSI/KL family ([q:quality_psi_drift], [q:text_unigram_drift])
    only answers whether two periods differ. This two-window scan is the
    standard scalable surrogate for exact change-point methods (it is
    one CUSUM/e-divisive contrast evaluated at every offset) — and unlike
    CUSUM's running-max recursion it needs no sequential state, so it
    stays a pure window plan.

    Determinism: the day grid is a calendar spine both engines generate
    identically ([q:events_gap_fill_hourly]'s shape); window sums are
    BIGINT; the argmax ranks on the EXACT integer |after−before| with a
    date tiebreak; the three reported averages are single divisions
    rounded to 6dp. Edge days with truncated frames are excluded by
    exact frame-COUNT equality, not by date arithmetic.

    Scale shape: one combiner groupBy collapses the fact stream to
    O(types × days) grid rows; everything after — spine join, the two
    framed sums, the per-series argmax — is windows over that grid, one
    exchange on event_type. At 100 TB the grid is still tiny (series ×
    calendar days); the scan dominates and it is a single pass."""
    e = load_table(spark, sf_dir, "events")
    span = e.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("d")
    )
    types = e.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(days))
    obs = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    grid = spine.join(obs, ["event_type", "d"], "left").select(
        "event_type", "d", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    before_f = w.rowsBetween(-_CP_W, -1)
    after_f = w.rowsBetween(0, _CP_W - 1)
    win = grid.select(
        "event_type",
        "d",
        F.sum("cnt").over(before_f).alias("before_sum"),
        F.count(F.lit(1)).over(before_f).alias("before_n"),
        F.sum("cnt").over(after_f).alias("after_sum"),
        F.count(F.lit(1)).over(after_f).alias("after_n"),
    ).where((F.col("before_n") == _CP_W) & (F.col("after_n") == _CP_W))
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.abs(F.col("after_sum") - F.col("before_sum")).desc(), F.col("d")
        )
    )
    top = win.withColumn("rk", rk).where(F.col("rk") == 1)

    def _avg(c) -> F.Column:
        return F.round(c.cast("double") / F.lit(float(_CP_W)), 6) + F.lit(0.0)

    return top.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("shift_day"),
        _avg(F.col("before_sum")).alias("before_daily_avg"),
        _avg(F.col("after_sum")).alias("after_daily_avg"),
        _avg(F.col("after_sum") - F.col("before_sum")).alias("shift"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# text_chisq_feature_select
# --------------------------------------------------------------------------

#: ignore terms appearing in fewer documents than this (chi-square is
#: unreliable below ~5 expected observations per cell)
_CHI_MIN_DF = 5

_CHISQ_ORACLE = f"""
    WITH dt AS (SELECT DISTINCT doc_id, (lang = 'en') AS is_en,
                       unnest(string_split(text, ' ')) AS term
                FROM documents),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                     AS BIGINT) AS e
            FROM documents),
    t AS (SELECT term,
                 CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS a,
                 CAST(SUM(CASE WHEN is_en THEN 0 ELSE 1 END) AS BIGINT) AS b
          FROM dt GROUP BY 1),
    cells AS (SELECT term, a, b, e - a AS c, (n - e) - b AS d, n, e
              FROM t CROSS JOIN tot
              WHERE a + b >= {_CHI_MIN_DF}
                AND a + b <= n - {_CHI_MIN_DF}),
    scored AS (
      SELECT term, a AS df_en, b AS df_other,
             CASE WHEN a * (n - e) > b * e THEN 'en' ELSE 'other' END
               AS leans,
             round((CAST(n AS DOUBLE)
                    * (CAST(a * d - b * c AS DOUBLE)
                       * CAST(a * d - b * c AS DOUBLE)))
                   / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                      * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)),
                   6) + 0.0 AS chi2
      FROM cells)
    SELECT term, df_en, df_other, leans, chi2
    FROM scored ORDER BY chi2 DESC, term LIMIT 20
    """


@query(
    "text_chisq_feature_select",
    oracle=_CHISQ_ORACLE,
    tags=("text", "feature-selection", "chisq", "llm"),
)
def q_text_chisq_feature_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared term selection against the ``lang = 'en'`` document
    class: for every vocabulary term (document frequency in
    [5, N−5] — chi² needs ~5 expected observations per cell, and an
    everywhere-term's degenerate table divides by zero), the 2×2
    document-frequency contingency statistic
    ``N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))`` with the association
    direction — the classic supervised feature-selection step (Yang &
    Pedersen 1997) between the token-stats family and any downstream
    classifier, and the exact-count sibling of [q:text_pmi_collocations].

    Determinism: all four contingency cells are BIGINT document counts
    from one conditional-sum groupBy; the association direction is an
    exact integer cross-multiplication; chi² is ONE parenthesised double
    expression over exactly-representable integers (no ln/exp anywhere),
    rounded to 6dp; the top-20 tiebreaks on term.

    Scale shape: per-doc distinct terms are scan-local
    (split→array_distinct→explode); the contingency table is a
    vocabulary-sized combiner groupBy (conditional sums ride the map-side
    partial); the class totals are a 1-row broadcast. At 100 TB this is
    the unigram-drift plan with a second conditional sum — one exchange
    of O(vocabulary) rows."""
    d = load_table(spark, sf_dir, "documents")
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("e"),
    )
    dt = d.select(
        (F.col("lang") == "en").alias("is_en"),
        F.explode(F.array_distinct(F.split("text", " "))).alias("term"),
    )
    t = dt.groupBy("term").agg(
        F.sum(F.when(F.col("is_en"), 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("is_en"), 0).otherwise(1)).cast("long").alias("b"),
    )
    cells = (
        t.crossJoin(F.broadcast(tot))
        .where(
            (F.col("a") + F.col("b") >= _CHI_MIN_DF)
            & (F.col("a") + F.col("b") <= F.col("n") - _CHI_MIN_DF)
        )
        .select(
            "term",
            "a",
            "b",
            (F.col("e") - F.col("a")).alias("c"),
            (F.col("n") - F.col("e") - F.col("b")).alias("d"),
            "n",
            "e",
        )
    )
    ad_bc = (F.col("a") * F.col("d") - F.col("b") * F.col("c")).cast("double")
    chi2 = (
        F.round(
            (F.col("n").cast("double") * (ad_bc * ad_bc))
            / (
                (F.col("a") + F.col("b")).cast("double")
                * (F.col("c") + F.col("d")).cast("double")
                * (F.col("a") + F.col("c")).cast("double")
                * (F.col("b") + F.col("d")).cast("double")
            ),
            6,
        )
        + F.lit(0.0)
    )
    scored = cells.select(
        "term",
        F.col("a").alias("df_en"),
        F.col("b").alias("df_other"),
        F.when(
            F.col("a") * (F.col("n") - F.col("e")) > F.col("b") * F.col("e"),
            "en",
        )
        .otherwise("other")
        .alias("leans"),
        chi2.alias("chi2"),
    )
    return scored.orderBy(F.desc("chi2"), "term").limit(20)


# --------------------------------------------------------------------------
# quality_benford_audit
# --------------------------------------------------------------------------

#: Benford expected first-digit frequencies log10(1 + 1/d), pre-rounded to
#: 6dp and embedded as LITERALS on both engines — nine published constants,
#: not in-plan transcendental math, so no libm ulp can reach the hasher.
_BENFORD = {d: round(math.log10(1.0 + 1.0 / d), 6) for d in range(1, 10)}

_BENFORD_CASE_SQL = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {_BENFORD[d]!r}" for d in range(1, 10))
    + " END"
)

_BENFORD_ORACLE = f"""
    WITH digits AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice)
                             AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER)
                      AS digit
                    FROM orders WHERE o_totalprice >= 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM digits),
    c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM digits GROUP BY 1),
    spine AS (SELECT CAST(unnest(range(1, 10)) AS INTEGER) AS digit),
    g AS (SELECT s.digit, COALESCE(c.cnt, 0) AS observed
          FROM spine s LEFT JOIN c ON c.digit = s.digit),
    x AS (SELECT digit, observed,
                 round(CAST(observed AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0
                   AS observed_freq,
                 CAST({_BENFORD_CASE_SQL} AS DOUBLE) AS expected_freq,
                 CAST(n AS DOUBLE) * CAST({_BENFORD_CASE_SQL} AS DOUBLE)
                   AS e_cnt
          FROM g CROSS JOIN tot),
    y AS (SELECT digit, observed, observed_freq, expected_freq,
                 CAST(round(((CAST(observed AS DOUBLE) - e_cnt)
                             * (CAST(observed AS DOUBLE) - e_cnt) / e_cnt)
                            * 1000000.0) AS BIGINT) AS contrib_micro
          FROM x),
    z AS (SELECT digit, observed, observed_freq, expected_freq,
                 contrib_micro,
                 SUM(contrib_micro) OVER () AS chi2_micro FROM y)
    SELECT digit, observed, observed_freq, expected_freq,
           round(CAST(contrib_micro AS DOUBLE) / 1000000.0, 6) + 0.0
             AS chi2_contrib,
           round(CAST(chi2_micro AS DOUBLE) / 1000000.0, 6) + 0.0
             AS chi2_total
    FROM z ORDER BY digit
    """


@query(
    "quality_benford_audit",
    oracle=_BENFORD_ORACLE,
    tags=("quality", "benford", "forensic", "audit"),
)
def q_quality_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of ``o_totalprice``: the observed
    leading-digit histogram against the published Benford frequencies
    ``log10(1 + 1/d)``, with per-digit chi² contributions and the suite
    total — the forensic-accounting staple (bounded synthetic price
    ranges genuinely FAIL it, so the audit's alarm branch is exercised,
    exactly like [q:quality_constraint_audit]'s failing uniqueness
    check).

    Determinism: digit extraction is integer/string surgery; observed
    counts are BIGINT on a dense 9-digit spine; the nine expected
    frequencies are pre-rounded LITERALS embedded identically in both
    plans (never in-plan log10 — no libm ulp exists); each chi²
    contribution is one fixed-order double expression folded to
    micro-unit integers, so the total has no float summation order.

    Scale shape: one conditional groupBy collapses the scan to <= 9 rows
    (map-side partial), the spine/total joins are 9-row/1-row
    broadcasts. At 100 TB this runs at scan speed — the audit twin of
    the PSI plan."""
    o = load_table(spark, sf_dir, "orders")
    digits = o.where(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    tot = digits.agg(F.count(F.lit(1)).cast("long").alias("n"))
    c = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    g = spine.join(c, "digit", "left").select(
        "digit", F.coalesce("cnt", F.lit(0)).alias("observed")
    )
    expected = F.expr(_BENFORD_CASE_SQL).cast("double")
    x = g.crossJoin(F.broadcast(tot)).select(
        "digit",
        "observed",
        (
            F.round(F.col("observed").cast("double") / F.col("n").cast("double"), 6)
            + F.lit(0.0)
        ).alias("observed_freq"),
        expected.alias("expected_freq"),
        (F.col("n").cast("double") * expected).alias("e_cnt"),
        F.col("observed").cast("double").alias("obs_d"),
    )
    contrib_micro = F.round(
        ((F.col("obs_d") - F.col("e_cnt"))
         * (F.col("obs_d") - F.col("e_cnt"))
         / F.col("e_cnt"))
        * F.lit(1000000.0)
    ).cast("long")
    y = x.select(
        "digit",
        "observed",
        "observed_freq",
        "expected_freq",
        contrib_micro.alias("contrib_micro"),
    )
    chi2_micro = F.sum("contrib_micro").over(Window.partitionBy())
    return y.select(
        "digit",
        "observed",
        "observed_freq",
        "expected_freq",
        (
            F.round(F.col("contrib_micro").cast("double") / F.lit(1000000.0), 6)
            + F.lit(0.0)
        ).alias("chi2_contrib"),
        (F.round(chi2_micro.cast("double") / F.lit(1000000.0), 6) + F.lit(0.0)).alias(
            "chi2_total"
        ),
    ).orderBy("digit")

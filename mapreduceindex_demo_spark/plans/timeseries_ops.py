"""Time-series resampling operators (round 8b): calendar-spine gap fill.

The hypertable-rollup shape every metrics/event pipeline needs: regularize
an irregular event stream onto a fixed grid (here: hourly per event_type),
then forward-fill the holes with the last observation — TimescaleDB's
``time_bucket_gapfill`` + ``locf``, InfluxDB's ``GROUP BY time() FILL
(previous)``, pandas' ``resample().ffill()``. The reference repo has no
time-series surface at all (it indexes mutations, SURVEY §2.2); this is
engine-completeness work in the same spirit as the window/as-of family.

Determinism: the per-cell observation is MAX of the value on an integer
micro-unit grid (order-independent, unlike "last seen"), the spine is a
closed timestamp sequence both engines generate identically, and the
forward fill is a framed window ``last(... ignore nulls)`` — no float
aggregation anywhere until the final single division, rounded to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceindex_demo_spark.plans.registry import query
from mapreduceindex_demo_spark.session import load_table

_GAPFILL_ORACLE = """
    WITH span AS (SELECT date_trunc('hour', min(ts)) AS h0,
                         date_trunc('hour', max(ts)) AS h1 FROM events),
    hours AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
              FROM span),
    types AS (SELECT DISTINCT event_type FROM events),
    spine AS (SELECT event_type, h FROM types CROSS JOIN hours),
    obs AS (SELECT event_type, date_trunc('hour', ts) AS h,
                   MAX(CAST(round(value * 1000000.0) AS BIGINT)) AS obs_micro
            FROM events GROUP BY 1, 2),
    j AS (SELECT s.event_type, s.h, o.obs_micro,
                 last_value(o.obs_micro IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS fill_micro
          FROM spine s LEFT JOIN obs o
            ON o.event_type = s.event_type AND o.h = s.h)
    SELECT event_type, strftime(h, '%Y-%m-%d %H:00') AS hour,
           round(CAST(fill_micro AS DOUBLE) / 1000000.0, 6) + 0.0
             AS value_ffill,
           (obs_micro IS NULL) AS is_gap
    FROM j
    """


@query(
    "events_gap_fill_hourly",
    oracle=_GAPFILL_ORACLE,
    tags=("timeseries", "gapfill", "locf", "events"),
)
def q_events_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-filled event series per event_type: a dense calendar
    spine over the stream's [min, max] hour, each cell carrying the
    hour's max observed value (micro-unit integer grid) forward-filled
    across empty hours (LOCF), with an ``is_gap`` marker on filled cells.
    Cells before a type's first observation stay NULL, exactly as
    TimescaleDB's ``locf`` leaves them.

    Scale shape: the spine is |types| × |hours| — generated rows, not
    data (a 1-row span aggregate broadcast into a sequence/explode, the
    [q:text_chunking] Generate family); the observation rollup is ONE
    map-side-combinable groupBy over the fact table, the spine join
    shuffles O(cells), and the forward fill is one window sorted within
    event_type partitions. At 100 TB the fact groupBy dominates and is
    embarrassingly parallel; the filled grid is O(keys × buckets),
    independent of event count — the whole point of rolling up before
    filling. A year of hourly cells across 1M keys is 8.8G rows, range-
    partitioned by (key, bucket) with no skew by construction."""
    e = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    span = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = span.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = e.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(hours))
    obs = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.max(F.round(F.col("value") * F.lit(1000000.0)).cast("long")).alias(
            "obs_micro"
        )
    )
    j = spine.join(obs, ["event_type", "h"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill = F.last("obs_micro", ignorenulls=True).over(w)
    return j.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        (
            F.round(fill.cast("double") / F.lit(1000000.0), 6) + F.lit(0.0)
        ).alias("value_ffill"),
        F.col("obs_micro").isNull().alias("is_gap"),
    )


_SCD2_ORACLE = """
    WITH ch AS (SELECT user_id, ts AS valid_from, MAX(value) AS v
                FROM events WHERE event_type = 'signup' GROUP BY 1, 2),
    dim AS (SELECT user_id, valid_from,
              lead(valid_from) OVER (PARTITION BY user_id
                                     ORDER BY valid_from) AS valid_to,
              CASE WHEN v < 100 THEN 'bronze'
                   WHEN v < 300 THEN 'silver'
                   ELSE 'gold' END AS tier
            FROM ch),
    f AS (SELECT user_id, ts,
                 CAST(round(value * 1000000.0) AS BIGINT) AS micro
          FROM events WHERE event_type = 'purchase'),
    j AS (SELECT coalesce(d.tier, 'pre_signup') AS tier, f.user_id, f.micro
          FROM f LEFT JOIN dim d
            ON d.user_id = f.user_id AND f.ts >= d.valid_from
               AND (d.valid_to IS NULL OR f.ts < d.valid_to))
    SELECT tier, COUNT(*) AS n_purchases,
           COUNT(DISTINCT user_id) AS n_users,
           round(CAST(SUM(micro) AS DOUBLE) / 1000000.0, 6) + 0.0
             AS revenue,
           round(CAST(SUM(micro) AS DOUBLE) / 1000000.0
                 / CAST(COUNT(*) AS DOUBLE), 6) + 0.0 AS avg_value
    FROM j GROUP BY tier ORDER BY tier
    """


@query(
    "events_scd2_temporal_join",
    oracle=_SCD2_ORACLE,
    tags=("timeseries", "scd2", "temporal-join", "events"),
)
def q_events_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build + point-in-time temporal join (the
    Kimball slowly-changing-dimension pattern every warehouse needs):
    the signup stream becomes a validity-interval dimension — per user,
    each change opens ``[ts, next-change)`` (the last interval open-ended)
    carrying a tier derived from the signup value — and each purchase
    fact joins the ONE tier row valid at its timestamp. Purchases before
    a user's first signup survive the left join as ``pre_signup``,
    exactly like facts predating dimension history. Revenue rides the
    integer micro-unit grid; both averages are one final division.

    Scale shape: interval construction is the sessionization family's
    single-exchange pass — one ``user_id`` partition drives the
    dedup-groupBy AND the ``lead`` window. The temporal join is an
    equi-join on ``user_id`` with the interval bounds as residual
    predicates (the as-of family's batch sibling): both sides shuffle
    once on the key, and per-key interval counts are bounded by change
    frequency, never fact volume. The rollup's count-distinct is the
    standard two-phase expansion. At 100 TB the dimension is |changes|
    rows — orders of magnitude under the fact table — and nothing in the
    plan is pairwise."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "value"
    )
    ch = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("v"))
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    dim = ch.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.when(F.col("v") < 100, "bronze")
        .when(F.col("v") < 300, "silver")
        .otherwise("gold")
        .alias("tier"),
    )
    f = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.round(F.col("value") * F.lit(1000000.0)).cast("long").alias("micro"),
    )
    j = f.join(
        dim,
        (dim["user_id"] == f["user_id"])
        & (f["ts"] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (f["ts"] < dim["valid_to"])),
        "left",
    ).select(
        F.coalesce(dim["tier"], F.lit("pre_signup")).alias("tier"),
        f["user_id"].alias("user_id"),
        "micro",
    )
    sum_d = F.sum("micro").cast("double")
    return (
        j.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.countDistinct("user_id").alias("n_users"),
            (F.round(sum_d / F.lit(1000000.0), 6) + F.lit(0.0)).alias(
                "revenue"
            ),
            (
                F.round(
                    sum_d
                    / F.lit(1000000.0)
                    / F.count(F.lit(1)).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("avg_value"),
        )
        .orderBy("tier")
    )

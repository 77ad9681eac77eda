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

"""Stream-stream interval join (SURVEY §2.5 T4/T5 adjunct; A6's as-of /
range join family in streaming form).

The reference has no join surface at all (SURVEY §2.4 — its only
doc↔index correlation is the implicit MERGE); in Structured Streaming a
stream-stream inner join with an event-time bound is the canonical way to
correlate two live feeds. The same builder runs in batch (for the DuckDB
oracle gate) and in streaming (tests feed it through readStream with
watermarks) — one declaration, both execution modes.

Scale shape: the join keys on user_id (hash shuffle both sides); the
event-time bound + watermarks let Spark expire buffered state, so steady-
state memory is O(watermark horizon × arrival rate per key), independent
of total stream length — the property that matters at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: attribution lookback: a click converts if a purchase follows within this
ATTRIBUTION_HORIZON = "1 hour"
#: late-data bound for both streams
LATENESS = "2 hours"


def split_click_purchase(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Project the two logical streams out of the events feed."""
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases


def click_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = ATTRIBUTION_HORIZON,
    watermark: str | None = None,
) -> DataFrame:
    """Inner interval join: purchase ⋈ clicks by the same user in the
    `horizon` before the purchase (click_ts ∈ [purchase_ts − horizon,
    purchase_ts]).

    With `watermark` set (streaming mode) both sides declare lateness
    bounds, which — combined with the time-range predicate — lets the
    state store evict expired rows (the unbounded-state fix).
    """
    if watermark is not None:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")
        )
    )
    return clicks.join(purchases, cond, "inner").select(
        F.col("purchase_id"),
        F.col("click_id"),
        F.col("p_user_id").alias("user_id"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_time"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_time"),
        F.col("purchase_value"),
    )


def purchase_attribution_left_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = ATTRIBUTION_HORIZON,
    watermark: str | None = None,
) -> DataFrame:
    """LEFT-OUTER interval join — the attribution join's organic-traffic
    twin: EVERY purchase survives; purchases with no same-user click in
    the horizon emit with NULL click columns and is_organic = true.

    In streaming mode this is the Structured Streaming outer
    stream-stream join: the watermark + event-time bound are REQUIRED
    (they define when a purchase's join window can no longer receive a
    matching click, which is the moment the NULL row may be emitted and
    its state evicted) — without them an outer join would have to hold
    every purchase forever. Same one-declaration/both-modes contract as
    ``click_attribution_join``.
    """
    if watermark is not None:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")
        )
    )
    return purchases.join(clicks, cond, "leftOuter").select(
        F.col("purchase_id"),
        F.col("click_id"),
        F.col("p_user_id").alias("user_id"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_time"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "purchase_time"
        ),
        F.col("purchase_value"),
        F.col("click_id").isNull().alias("is_organic"),
    )


def attribution_full_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = ATTRIBUTION_HORIZON,
    watermark: str | None = None,
) -> DataFrame:
    """FULL-OUTER interval join — the last of the T6 join family
    (inner ``click_attribution_join`` → left ``purchase_attribution_left_
    join`` → this): every purchase emits (attributed or organic) AND
    every click that converted nothing emits with NULL purchase columns
    — the three-way funnel ledger (converted / organic / unconverted) in
    one declaration.

    In streaming mode this is Structured Streaming's full-outer
    stream-stream join (supported since 3.1 for watermarked time-bound
    joins): EACH side's NULL row is emitted exactly when the watermark
    proves the other side can no longer match it — which is also its
    state-eviction moment. Same one-declaration/both-modes contract as
    the inner and left twins.
    """
    if watermark is not None:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")
        )
    )
    return purchases.join(clicks, cond, "fullOuter").select(
        F.col("purchase_id"),
        F.col("click_id"),
        F.coalesce(F.col("p_user_id"), F.col("c_user_id")).alias("user_id"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_time"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "purchase_time"
        ),
        F.col("purchase_value"),
        F.when(F.col("purchase_id").isNull(), F.lit("unconverted"))
        .when(F.col("click_id").isNull(), F.lit("organic"))
        .otherwise(F.lit("attributed"))
        .alias("row_kind"),
    )

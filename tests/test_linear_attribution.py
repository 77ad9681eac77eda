"""Pure-Python recomputation of linear multi-touch attribution, plus the
no-cartesian plan pin."""

from __future__ import annotations

import datetime as dt
import re

import pyarrow.parquet as pq

from mapreduceindex_demo_spark.plans import QUERIES
from tests.conftest import PARITY_SF_DIR


def test_linear_attribution_matches_python(spark):
    ev = pq.read_table(
        f"{PARITY_SF_DIR}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    ).to_pylist()
    touches: dict[int, list] = {}
    for r in ev:
        if r["event_type"] in ("view", "click"):
            touches.setdefault(r["user_id"], []).append((r["ts"], r["event_type"]))
    week = dt.timedelta(days=7)
    per_channel: dict[str, list[int]] = {}
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        hits = [
            et
            for (ts, et) in touches.get(r["user_id"], [])
            if ts <= r["ts"] and ts > r["ts"] - week
        ]
        if not hits:
            continue
        credit = 1_000_000 // len(hits)
        for et in hits:
            n, m = per_channel.setdefault(et, [0, 0])
            per_channel[et][0] = n + 1
            per_channel[et][1] = m + credit
    rows = QUERIES["purchase_linear_attribution"].fn(spark, PARITY_SF_DIR).collect()
    assert {r.event_type for r in rows} == set(per_channel)
    for r in rows:
        n, m = per_channel[r.event_type]
        assert (r.n_touches, r.credit_micro) == (n, m), r.event_type
        assert abs(r.credit - round(m / 1_000_000.0, 6)) < 1e-12
    # multi-touch must actually occur: total credit < purchases-with-touches
    # only when flooring leaked, and the channel split must be non-trivial
    assert len(rows) == 2


def test_linear_attribution_is_user_partitioned_join(spark):
    """The interval join must execute as an equi-join on user_id with the
    range predicate inside it — never a cartesian/broadcast-nested-loop."""
    df = QUERIES["purchase_linear_attribution"].fn(spark, PARITY_SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert not re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan), plan

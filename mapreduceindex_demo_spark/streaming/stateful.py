"""Custom stateful streaming operator (SURVEY §2.5 T5) via
applyInPandasWithState — the escape hatch for semantics the built-in
windows can't express (the reference's analogue: the index itself is the
only state, maintained by hand-rolled Go; here arbitrary keyed state is a
first-class, checkpointed primitive).

Example operator: per-user running counters (events seen, value sum,
last-seen seqno) emitted once per micro-batch — the shape of a 100 TB
feature-store accumulator. State is partitioned by user_id across
executors; each group's state is a few scalars, so memory is O(distinct
keys / executors).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

#: output schema of the running counter operator
COUNTER_SCHEMA = (
    "user_id bigint, events_seen bigint, value_sum double, last_event_id bigint"
)
#: state schema: (events_seen, value_cents, last_event_id)
STATE_SCHEMA = "events bigint, cents bigint, last_id bigint"


def _update_counters(
    key: tuple, pdfs: Iterable, state: GroupState
) -> Iterator:
    """Fold a user's micro-batch rows into persistent state; emit the
    updated totals. Integer-cents arithmetic keeps sums exact."""
    import pandas as pd

    if state.exists:
        events, cents, last_id = state.get
    else:
        events, cents, last_id = 0, 0, -1
    for pdf in pdfs:
        events += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
        if len(pdf):
            last_id = max(last_id, int(pdf["event_id"].max()))
    state.update((events, cents, last_id))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "events_seen": [events],
            "value_sum": [cents / 100.0],
            "last_event_id": [last_id],
        }
    )


def running_user_counters(events_stream: DataFrame) -> DataFrame:
    """Attach the stateful counter operator to a (streaming) events frame."""
    return (
        events_stream.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_counters,
            outputStructType=COUNTER_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class RunningCounterProcessor(StatefulProcessor):
    """Same running-counter semantics on Spark 4's arbitrary-stateful API
    (`transformWithStateInPandas`) — the successor to applyInPandasWithState:
    named state variables (ValueState/ListState/MapState) with optional TTL
    and timers instead of one monolithic state tuple. State lives in the
    state store keyed by user_id, so memory stays O(distinct keys /
    executors) and the operator is checkpoint-recoverable like any other."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        if self._totals.exists():
            events, cents, last_id = self._totals.get()
        else:
            events, cents, last_id = 0, 0, -1
        for pdf in rows:
            events += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
            if len(pdf):
                last_id = max(last_id, int(pdf["event_id"].max()))
        self._totals.update((events, cents, last_id))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "events_seen": [events],
                "value_sum": [cents / 100.0],
                "last_event_id": [last_id],
            }
        )

    def close(self) -> None:
        pass


def running_user_counters_tws(events_stream: DataFrame) -> DataFrame:
    """transformWithStateInPandas flavor of :func:`running_user_counters` —
    must produce identical final state (asserted in tests)."""
    return (
        events_stream.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningCounterProcessor(),
            outputStructType=COUNTER_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )

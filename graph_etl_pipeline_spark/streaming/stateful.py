"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.9 extension — the brief's named mechanism for stateful logic
the built-in windowed aggregations can't express).

The operator keeps ONE fixed-size state tuple per group key, updated
from Arrow-batched pandas frames — Spark's state store handles
persistence (checkpointed, restart-recoverable, evictable by timeout),
so unlike a foreachBatch accumulator the state survives executor loss
and scales to as many keys as the store can shard. At 100 TB/day this
is the shape for per-entity lifetime aggregates, fraud counters, or
session carry-over where session_window's gap semantics don't fit.

Determinism: monetary values are accumulated as INTEGER CENTS (the
double column is exact to 2 decimals, so round(value·100) is exact);
float summation order across micro-batches never enters the result.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_cents bigint"
_STATE_SCHEMA = "n bigint, cents bigint"


def _update_running_totals(key, pdfs, state: GroupState):
    """Fold this micro-batch's events into the user's persistent
    (n_events, total_cents) state and emit the UPDATED cumulative row —
    one output row per (user, micro-batch) that saw events."""
    import pandas as pd

    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_cents": [cents]})


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (event count, value total) over the stream.
    Output mode "update": each micro-batch emits the new cumulative row
    for every user it touched; downstream consumers read the latest row
    per user (monotone in n_events, so MAX selects it)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_GAP_MIN = 30
SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, n_events bigint, session_cents bigint"
)
_SESSION_STATE_SCHEMA = (
    "start_us bigint, last_us bigint, n bigint, cents bigint"
)


def _update_sessions(key, pdfs, state: GroupState):
    """Custom sessionization with EVENT-TIME TIMEOUT — the state-eviction
    mechanism session_window hides, exercised directly: in-batch gaps
    close sessions immediately; the batch's trailing open session parks
    in the state store with a timeout at (last event + gap), and when the
    WATERMARK passes that point Spark calls this function again with
    ``state.hasTimedOut`` — the open session is emitted closed and the
    state cleared. Splits use the streaming convention (a gap of exactly
    the threshold starts a new session, matching session_window's
    interval-overlap semantics)."""
    import pandas as pd

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000

    if state.hasTimedOut:
        start_us, last_us, n, cents = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "n_events": [n],
                "session_cents": [cents],
            }
        )
        return

    rows = pd.concat(list(pdfs), ignore_index=True)
    rows["_us"] = rows["ts"].astype("int64") // 1000
    rows["_cents"] = (rows["value"] * 100).round().astype("int64")
    rows = rows.sort_values(["_us", "event_id"], ignore_index=True)

    if state.exists:
        start_us, last_us, n, cents = state.get
    else:
        start_us = last_us = None
        n = cents = 0

    out = {"user_id": [], "session_start": [], "n_events": [], "session_cents": []}
    for us, cent in zip(rows["_us"], rows["_cents"]):
        if start_us is None:
            start_us, last_us, n, cents = us, us, 1, int(cent)
        elif us - last_us >= gap_us:
            out["user_id"].append(key[0])
            out["session_start"].append(pd.Timestamp(start_us, unit="us"))
            out["n_events"].append(n)
            out["session_cents"].append(cents)
            start_us, last_us, n, cents = us, us, 1, int(cent)
        else:
            last_us, n, cents = us, n + 1, cents + int(cent)
    state.update((int(start_us), int(last_us), int(n), int(cents)))
    # event-time timeout: fire when the watermark passes last event + gap
    state.setTimeoutTimestamp((last_us + gap_us) // 1000)
    if out["user_id"]:
        yield pd.DataFrame(out)


def session_totals_with_timeout(stream: DataFrame) -> DataFrame:
    """Per-user sessions via applyInPandasWithState + EventTimeTimeout.
    Requires a watermark on ``ts``; every session is emitted exactly once
    — in-batch when a later event proves the gap, or on state timeout
    when the watermark proves no more events can join."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_sessions,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

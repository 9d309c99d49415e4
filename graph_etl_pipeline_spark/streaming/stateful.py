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

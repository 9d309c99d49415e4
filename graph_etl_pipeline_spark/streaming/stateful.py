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
    import numpy as np
    import pandas as pd

    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {
            "user_id": np.array([key[0]], dtype=np.int64),
            "n_events": np.array([n], dtype=np.int64),
            "total_cents": np.array([cents], dtype=np.int64),
        }
    )


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


def _sessions_frame(user_id: int, starts_us, ns, cents):
    """Typed output frame — explicit dtypes keep Spark's Arrow serializer
    off the pandas dtype-inference path (object-dtype / empty frames make
    its internal concat fall back to the slow deprecated merge).

    The timestamp column is built by REINTERPRETING the int64 microsecond
    array as datetime64[us] (zero-copy view) instead of pd.to_datetime:
    this function runs once per (group, micro-batch) — ~3,000 times per
    bench run at sf0.1, mostly 1-row frames on the timeout-flush path —
    and the view construction measures 4x cheaper (0.17 ms vs 0.67 ms per
    1-row frame). Arrow serializes M8[us] directly; the output schema is
    microsecond-precision Spark TimestampType either way."""
    import numpy as np
    import pandas as pd

    k = len(ns)
    return pd.DataFrame(
        {
            "user_id": np.full(k, user_id, dtype=np.int64),
            "session_start": np.asarray(starts_us, dtype=np.int64).view("M8[us]"),
            "n_events": np.asarray(ns, dtype=np.int64),
            "session_cents": np.asarray(cents, dtype=np.int64),
        },
        copy=False,
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
    interval-overlap semantics).

    The per-group body is VECTORIZED (r13 — the bench floor for this
    query is Python-worker compute): segment boundaries come from one
    diff-against-gap comparison over the sorted event times, per-session
    counts/sums from ``np.add.reduceat`` over the boundary index — no
    per-row Python loop, so a group costs O(sort) numpy time plus a
    constant, identical output to the scalar fold it replaced
    (tests/test_streaming.py pins batch-split/replay equivalence).

    ORDERING CONTRACT (r15): disorder WITHIN a batch is handled exactly
    (the fold sorts). Across batches, a late event that still merges
    into the carried open session folds aggregate-wise (min start / max
    last); but a session already emitted — the operator emits an
    in-batch-gap-proved session immediately, trading session_window's
    watermark-delayed emission for latency — cannot be re-opened or
    bridged by later-arriving data. Ingest that cannot bound cross-batch
    disorder per user should use the watermark-delayed variant
    (stream_session_window / win_session_batch semantics) instead."""
    import numpy as np

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000

    if state.hasTimedOut:
        start_us, last_us, n, cents = state.get
        state.remove()
        yield _sessions_frame(key[0], [start_us], [n], [cents])
        return

    us_parts, cent_parts, eid_parts = [], [], []
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        us_parts.append(pdf["ts"].astype("int64").to_numpy() // 1000)
        cent_parts.append((pdf["value"] * 100).round().astype("int64").to_numpy())
        eid_parts.append(pdf["event_id"].to_numpy())
    if not us_parts:
        # All-empty (non-timeout) invocation: nothing to fold. Keep any
        # open session alive by re-arming its event-time timeout — the
        # timeout registration does not survive an invocation, so
        # skipping this would silently drop the pending close (ADVICE
        # r13 #1: the vectorized path previously indexed brk[0] here).
        if state.exists:
            state.setTimeoutTimestamp((int(state.get[1]) + gap_us) // 1000)
        return
    us = us_parts[0] if len(us_parts) == 1 else np.concatenate(us_parts)
    cent = cent_parts[0] if len(cent_parts) == 1 else np.concatenate(cent_parts)
    eid = eid_parts[0] if len(eid_parts) == 1 else np.concatenate(eid_parts)
    order = np.lexsort((eid, us))
    us, cent = us[order], cent[order]

    carried = state.get if state.exists else None
    # brk[i] = event i STARTS a new session; the first event continues
    # the carried open session unless the gap since its last event says
    # otherwise.
    brk = np.empty(len(us), dtype=bool)
    brk[0] = carried is None or us[0] - carried[1] >= gap_us
    np.greater_equal(us[1:] - us[:-1], gap_us, out=brk[1:])
    bounds = np.flatnonzero(brk)
    if not brk[0]:
        bounds = np.concatenate(([0], bounds))  # continuation segment
    counts = np.diff(np.append(bounds, len(us)))
    sums = np.add.reduceat(cent, bounds)
    starts = us[bounds].copy()
    if carried is not None and not brk[0]:
        # min/max folds (not overwrites) so a cross-batch late event
        # cannot regress the session's start or its stored last-event
        # time (the ordering contract above) — no-ops on ordered input
        starts[0] = min(int(carried[0]), int(starts[0]))
        counts[0] += carried[2]
        sums[0] += carried[3]

    emit_starts, emit_ns, emit_cents = starts[:-1], counts[:-1], sums[:-1]
    if carried is not None and brk[0]:
        # the carried session closed at the batch boundary: emit it first
        emit_starts = np.concatenate(([carried[0]], emit_starts))
        emit_ns = np.concatenate(([carried[2]], emit_ns))
        emit_cents = np.concatenate(([carried[3]], emit_cents))

    last_us = int(us[-1])
    if carried is not None and not brk[0] and len(bounds) == 1:
        # the trailing open segment IS the continuation: keep the max
        # last-event time so a late batch cannot pull the gap horizon
        # backwards (ordering contract)
        last_us = max(last_us, int(carried[1]))
    state.update((int(starts[-1]), last_us, int(counts[-1]), int(sums[-1])))
    # event-time timeout: fire when the watermark passes last event + gap
    state.setTimeoutTimestamp((int(last_us) + gap_us) // 1000)
    if len(emit_ns):
        yield _sessions_frame(key[0], emit_starts, emit_ns, emit_cents)


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


# --- Bucketed-state sessionizer (r15) ----------------------------------------
#
# The SCALE path for applyInPandasWithState sessionization. The per-user
# operator above pays the engine's per-GROUP fixed cost (state Arrow
# round trip, GroupState construction, one output frame) for every user
# every micro-batch — measured r15 at ~1.9 ms/invocation × 3,002
# invocations at sf0.1, i.e. the dominant Python-side cost, and at 100 TB
# (100M+ users/day) the difference between thousands and hundreds of
# millions of per-batch state round trips. Bucketing the STATE KEY to
# pmod(user_id, B) amortizes that fixed cost across ~(users/B) users per
# group while keeping per-user session semantics exactly: the per-bucket
# state packs each open session into parallel int64 arrays, the fold is
# one vectorized pass over the bucket's (user, ts)-sorted events, and
# eviction sweeps the packed arrays against the event-time watermark.
# B is the state-volume knob production sizes (keys × bytes ÷ target
# store size) — the same rule stream_shuffle_partitions documents.
#
# WHICH SESSIONIZER TO PICK (r16, VERDICT r15 #6 — the two operators are
# output-identical, so the choice is purely a cost model):
#
#   * users/batch ≲ 2× TARGET_USERS_PER_BUCKET (~100): use the PER-USER
#     operator. Bucketing degenerates to ~1 user per bucket — you pay
#     the pmod column, the array-packed state encode/decode, and the
#     sweep bookkeeping while amortizing nothing.
#   * otherwise: use the BUCKETED operator sized by session_buckets_for.
#     Per-group engine fixed cost (~1.9 ms measured r15) times users is
#     the dominant term; bucketing divides it by users/B. At 100M
#     users/day this is hundreds of millions fewer state round trips
#     per batch.
#
# session_buckets_for targets ~TARGET_USERS_PER_BUCKET open sessions per
# bucket: large enough to amortize the fixed cost ~50×, small enough
# that one bucket's packed arrays (5 × int64 × users/B ≈ 2 KB at the
# target) stay far below the state store's per-key value comfort zone
# and the per-invocation numpy fold stays cache-resident. The cap keeps
# B below the shuffle-partition count — more buckets than state-store
# shards buys no extra parallelism, only per-group overhead back.

TARGET_USERS_PER_BUCKET = 50
_MAX_SESSION_BUCKETS = 4096


def session_buckets_for(expected_users: int) -> int:
    """Bucket count for ``session_totals_bucketed`` given the expected
    concurrent (open-session) user count — the sizing policy documented
    above. Returns at least 1; callers with users/batch below
    ~2×TARGET_USERS_PER_BUCKET should prefer the per-user operator."""
    if expected_users <= 0:
        return 1
    return max(
        1,
        min(
            _MAX_SESSION_BUCKETS,
            -(-expected_users // TARGET_USERS_PER_BUCKET),  # ceil div
        ),
    )


# Default for the bench/driver fixture scale: sf0.1's events table holds
# ~3,000 distinct users, so the policy yields ceil(3000/50) = 60 — kept
# at the nearest power of two (64) from the r15 A/B, which measured
# within noise of 60 and keeps pmod-friendly alignment. The checklist
# test pins SESSION_BUCKETS to within 2× of the policy value so the
# default cannot drift away from the documented rule.
FIXTURE_EXPECTED_USERS = 3_000
SESSION_BUCKETS = 64
_BUCKET_STATE_SCHEMA = (
    "users array<bigint>, starts array<bigint>, lasts array<bigint>, "
    "ns array<bigint>, cents array<bigint>"
)


def _update_bucket_sessions(key, pdfs, state: GroupState):
    """Vectorized multi-user sessionization for one user bucket.

    Differences from the per-user operator, both forced by bucketing:

      * EVICTION IS A SWEEP, not whole-state removal: the bucket's
        registered event-time timeout is min(open deadlines); on ANY
        invocation (timeout or data) every user whose deadline passed
        the current watermark is closed and dropped, because a bucket
        that received data gets no separate timeout invocation for its
        other users that batch;
      * the timeout re-arms at the MIN remaining deadline, so the engine
        wakes the bucket exactly when its earliest open session expires.

    EMISSION-TIMING NOTE (content is pinned equal; timing is not): the
    sweep closes watermark-expired co-bucketed sessions inside DATA
    invocations too, so a session can land in an earlier micro-batch
    than it would under the per-user operator (which waits for the
    engine's timeout invocation). Final availableNow output is
    test-pinned identical to the per-user twin and to the
    gaps-and-islands batch oracle; consumers sensitive to WHICH
    micro-batch a session closes in would observe the divergence.

    Session semantics (>= gap splits, integer cents, carried open
    sessions merge with a continuing first segment) are identical to
    ``_update_sessions`` — tests pin output equality between the two
    operators and against the batch gaps-and-islands oracle."""
    import numpy as np

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    wm_us = state.getCurrentWatermarkMs() * 1000

    if state.exists:
        su, ss, sl, sn, sc = (np.asarray(v, dtype=np.int64) for v in state.get)
    else:
        su = ss = sl = sn = sc = np.empty(0, dtype=np.int64)

    emit_u: list = []
    emit_s: list = []
    emit_n: list = []
    emit_c: list = []

    if not state.hasTimedOut:
        us_parts, cent_parts, uid_parts, eid_parts = [], [], [], []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            us_parts.append(pdf["ts"].astype("int64").to_numpy() // 1000)
            cent_parts.append(
                (pdf["value"] * 100).round().astype("int64").to_numpy()
            )
            uid_parts.append(pdf["user_id"].to_numpy().astype(np.int64))
            eid_parts.append(pdf["event_id"].to_numpy())
        if us_parts:
            us = np.concatenate(us_parts)
            cent = np.concatenate(cent_parts)
            uid = np.concatenate(uid_parts)
            eid = np.concatenate(eid_parts)
            order = np.lexsort((eid, us, uid))
            uid, us, cent = uid[order], us[order], cent[order]

            first = np.empty(len(uid), dtype=bool)
            first[0] = True
            np.not_equal(uid[1:], uid[:-1], out=first[1:])
            brk = np.empty(len(uid), dtype=bool)
            brk[0] = True
            np.greater_equal(us[1:] - us[:-1], gap_us, out=brk[1:])

            idxf = np.flatnonzero(first)
            batch_users = uid[idxf]
            if len(su):
                pos = np.searchsorted(su, batch_users)
                pos_c = np.minimum(pos, len(su) - 1)
                has_carry = su[pos_c] == batch_users
                cont = has_carry & (us[idxf] - sl[pos_c] < gap_us)
            else:
                pos_c = np.zeros(len(idxf), dtype=np.int64)
                has_carry = np.zeros(len(idxf), dtype=bool)
                cont = has_carry
            closed_carry = has_carry & ~cont
            if closed_carry.any():
                ci = pos_c[closed_carry]
                emit_u.append(su[ci])
                emit_s.append(ss[ci])
                emit_n.append(sn[ci])
                emit_c.append(sc[ci])

            seg = brk.copy()
            seg[idxf] = True  # every user's first row starts a segment
            bounds = np.flatnonzero(seg)
            counts = np.diff(np.append(bounds, len(uid)))
            sums = np.add.reduceat(cent, bounds)
            starts = us[bounds].copy()
            seg_uid = uid[bounds]
            seg_last = us[np.append(bounds[1:], len(uid)) - 1]

            # merge carried open sessions into continuing first segments
            # — min start / max last folds, not overwrites, so a
            # cross-batch late event cannot regress the session start or
            # pull the gap horizon backwards (the ordering contract in
            # _update_sessions' docstring applies here identically;
            # no-ops on ordered input)
            if cont.any():
                m = np.searchsorted(bounds, idxf[cont])  # exact positions
                ci = pos_c[cont]
                starts[m] = np.minimum(ss[ci], starts[m])
                seg_last[m] = np.maximum(seg_last[m], sl[ci])
                counts[m] += sn[ci]
                sums[m] += sc[ci]

            # all but each user's LAST segment close in-batch
            seg_is_last = np.empty(len(seg_uid), dtype=bool)
            seg_is_last[-1] = True
            np.not_equal(seg_uid[:-1], seg_uid[1:], out=seg_is_last[:-1])
            closed = ~seg_is_last
            if closed.any():
                emit_u.append(seg_uid[closed])
                emit_s.append(starts[closed])
                emit_n.append(counts[closed])
                emit_c.append(sums[closed])

            # new open set: untouched carried users + per-user trailing
            # segments, re-sorted by user for the next searchsorted
            keep = (
                ~np.isin(su, batch_users)
                if len(su)
                else np.zeros(0, dtype=bool)
            )
            su = np.concatenate([su[keep], seg_uid[seg_is_last]])
            ss = np.concatenate([ss[keep], starts[seg_is_last]])
            sl = np.concatenate([sl[keep], seg_last[seg_is_last]])
            sn = np.concatenate([sn[keep], counts[seg_is_last]])
            sc = np.concatenate([sc[keep], sums[seg_is_last]])
            o = np.argsort(su, kind="stable")
            su, ss, sl, sn, sc = su[o], ss[o], sl[o], sn[o], sc[o]

    # watermark sweep — strict <, mirroring the engine's own event-time
    # timeout condition (fires when timeoutTimestamp < watermark); on
    # batch 0 the watermark is 0 and nothing sweeps
    if len(su):
        expired = (sl + gap_us) < wm_us
        if expired.any():
            emit_u.append(su[expired])
            emit_s.append(ss[expired])
            emit_n.append(sn[expired])
            emit_c.append(sc[expired])
            live = ~expired
            su, ss, sl, sn, sc = su[live], ss[live], sl[live], sn[live], sc[live]

    if len(su):
        state.update(
            (su.tolist(), ss.tolist(), sl.tolist(), sn.tolist(), sc.tolist())
        )
        # re-arm at the MIN remaining deadline, rounded UP to the next
        # millisecond (ADVICE r15 #2): flooring would let a deadline
        # inside the watermark's millisecond re-arm exactly AT the
        # watermark — PySpark's validation allows it (strict <) but the
        # engine's strict-< fire condition then wakes the bucket one
        # batch before the sweep can evict anything (a harmless but
        # wasted no-op invocation)
        state.setTimeoutTimestamp((int((sl + gap_us).min()) + 999) // 1000)
    elif state.exists:
        state.remove()

    if emit_u:
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": np.concatenate(emit_u),
                "session_start": np.concatenate(emit_s).view("M8[us]"),
                "n_events": np.concatenate(emit_n),
                "session_cents": np.concatenate(emit_c),
            },
            copy=False,
        )


def session_totals_bucketed(stream: DataFrame, buckets: int | None = None) -> DataFrame:
    """Per-user sessions with BUCKETED state keys — identical output to
    ``session_totals_with_timeout``, per-group overhead amortized across
    ~(users/buckets) users. Requires a watermark on ``ts``.

    This is the DEFAULT sessionizer at scale (see the module-level
    sizing policy): ``buckets=None`` applies ``SESSION_BUCKETS``, which
    the checklist test pins to the ``session_buckets_for`` policy at the
    fixture's user count. Production callers pass
    ``session_buckets_for(expected_concurrent_users)``; tiny-user
    streams (≲2×TARGET_USERS_PER_BUCKET users/batch) should use
    ``session_totals_with_timeout`` instead."""
    from pyspark.sql import functions as F

    if buckets is None:
        buckets = SESSION_BUCKETS

    return (
        stream.withWatermark("ts", "1 hour")
        .withColumn("bucket", F.pmod(F.col("user_id"), F.lit(buckets)))
        .groupBy("bucket")
        .applyInPandasWithState(
            _update_bucket_sessions,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_BUCKET_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

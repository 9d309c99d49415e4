"""Bounded within-group self-pair generation — the ONE copy of the
cap/probe/triangle-tile idea that previously existed three times over
(embedding-cosine hot labels, copurchase hot baskets, and the dedup
df-cap all bound quadratic per-group fanout the same way; VERDICT r6 #4
asked for the extraction).

``bounded_self_pairs(df, key, order_col, cap, select_pairs)`` emits every
within-``key`` pair (a, b) with ``a.order_col < b.order_col`` — exactly
the plain per-group self-join's pair set — but ADAPTIVELY:

* A map-combined per-key count probes for groups over ``cap``. None (the
  common case once upstream blocking sizes groups sanely) ⇒ the plain
  self-join, zero extra work, zero WindowExecs. The probe's verdict is
  memoized per (application, input plan, key, cap) — see ``_HOT_PROBE``
  — so steady-state runs skip the eager count job entirely.
* Hot groups present (power-law corpora — hub nodes, mega-baskets, fat
  LSH buckets) ⇒ keys split cold/hot via broadcast anti/semi joins; cold
  keys keep the plain join, hot keys go through TRIANGLE TILING: rows
  are chunked into runs of ≤ cap in ``order_col`` order, and the join
  shuffles on (key, tile_i, tile_j), so a group of n rows becomes
  (n/cap)² independent tiles of ≤ cap² pair candidates each instead of a
  single n² task. Each (a, b) pair lands in exactly one tile
  (chunk_a, chunk_b), so the union of the two branches is identical to
  the naive join; only the work distribution changes. Replication is
  linear in group size (each row ships to ≤ nchunks tiles) vs the
  quadratic straggler it removes.

Determinism contract: (key, order_col) must be unique per row (every
caller feeds a distinct-ed edge/bucket/vector table), so the chunking
window has no ties and every recomputation assigns identical chunks —
the assignment is recomputed per join side rather than materialized
(scan + one window exchange, cheaper than a storage round-trip).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# Internal column names; callers' frames must not collide.
_TILE_I, _TILE_J, _CHUNK, _MAXC = "__tile_i", "__tile_j", "__chunk", "__max_chunk"

# Hot-key probe memo: (applicationId, input-plan semanticHash, key, cap)
# -> bool. The probe is BLOCKING STATISTICS, not data — both branches emit
# the identical pair set (a stale/wrong verdict can only mis-pick the
# physical strategy, never the rows), so caching it per corpus is the
# same move a production planner makes when it keeps table stats between
# queries. Without the memo every steady-state run of an adaptive caller
# pays one full eager count job before the real query starts (measured
# sf0.1: ~0.4 s of the dedup_embedding_cosine bench row was this probe).
# Values are plain bools — no DataFrame/checkpoint retention (the
# ADVICE r11 #2 backlog class does not apply) — and the dict is cleared
# at a small cap as a belt-and-braces bound.
_HOT_PROBE: dict[tuple, bool] = {}
_HOT_PROBE_CAP = 256


def hot_keys(df: DataFrame, key: str, cap: int) -> DataFrame:
    """Keys whose group size exceeds ``cap`` — one map-combined count."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > cap)
        .select(key)
    )


def plain_self_pairs(df: DataFrame, key: str, order_col: str) -> DataFrame:
    """Per-key a<b self-join — one shuffle, no replication. Correct and
    optimal while every group fits the cap. Returns the a/b-aliased join
    for the caller's pair projection."""
    a, b = df.alias("a"), df.alias("b")
    return a.join(
        b,
        (F.col(f"a.{key}") == F.col(f"b.{key}"))
        & (F.col(f"a.{order_col}") < F.col(f"b.{order_col}")),
    )


def tiled_self_pairs(df: DataFrame, key: str, order_col: str, cap: int) -> DataFrame:
    """Within-key pairs for HOT groups, triangle-tiled (module docstring).
    Returns the a/b-aliased join filtered to a.order_col < b.order_col."""
    w = Window.partitionBy(key).orderBy(order_col)
    # max_chunk rides the SAME per-key exchange as row_number (second
    # WindowExec, zero extra shuffle) — no aggregate + broadcast side
    # input for the fan-out bound.
    chunked = df.withColumn(
        _CHUNK, ((F.row_number().over(w) - F.lit(1)) / F.lit(cap)).cast("int")
    ).withColumn(_MAXC, F.max(_CHUNK).over(Window.partitionBy(key)))
    # A pair (a, b) with a.order < b.order has chunk_a <= chunk_b (chunks
    # follow order_col order). Left fans out to tiles (chunk, j) for
    # j >= chunk; right to tiles (i, chunk) for i <= chunk; they meet
    # exactly once, at tile (chunk_a, chunk_b).
    base = [c for c in df.columns]
    left = chunked.withColumn(
        _TILE_J, F.explode(F.sequence(F.col(_CHUNK), F.col(_MAXC)))
    ).select(*base, F.col(_CHUNK).alias(_TILE_I), _TILE_J)
    right = chunked.withColumn(
        _TILE_I, F.explode(F.sequence(F.lit(0), F.col(_CHUNK)))
    ).select(*base, _TILE_I, F.col(_CHUNK).alias(_TILE_J))
    return (
        left.alias("a")
        .join(right.alias("b"), [key, _TILE_I, _TILE_J])
        .filter(F.col(f"a.{order_col}") < F.col(f"b.{order_col}"))
    )


def bounded_self_pairs(
    df: DataFrame,
    key: str,
    order_col: str,
    cap: int,
    select_pairs: Callable[[DataFrame], DataFrame],
    plain_impl: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """All within-``key`` (a, b) pairs with a.order_col < b.order_col,
    hot groups triangle-tiled (module docstring). ``select_pairs``
    projects the a/b-aliased pair join down to the caller's columns; it
    runs once per branch so the cold/hot union has a consistent schema.

    ``plain_impl`` overrides HOW the bounded (non-hot) branch builds its
    a/b-aliased pair join — e.g. a broadcast equi-join when the key has
    few distinct values and a shuffle join would collapse parallelism to
    the key count (the SemDeDup cell join). It must emit exactly
    ``plain_self_pairs``' pair set; only the physical strategy differs."""
    plain = plain_impl or (lambda d: plain_self_pairs(d, key, order_col))
    # Memo key includes the resolved input FILE LIST, not just the plan
    # hash (ADVICE r12 #2): semanticHash is plan-shape-based, so data
    # rewritten in place under the same path within one application
    # would otherwise serve a stale verdict and a newly-hot corpus could
    # run the unbounded plain join — the skew blowup this module exists
    # to prevent. inputFiles() is a driver-side plan walk (no job); a
    # re-ingest that changes any part file changes the key. Same
    # fingerprint discipline as graph_queries._ANF_DENOMS.
    try:
        files = tuple(sorted(df.inputFiles()))
    except Exception:
        files = ()  # non-file-backed frames: plan hash alone
    probe_key = (
        df.sparkSession.sparkContext.applicationId,
        df.semanticHash(),
        files,
        key,
        cap,
    )
    has_hot = _HOT_PROBE.get(probe_key)
    if has_hot is None:
        has_hot = hot_keys(df, key, cap).limit(1).count() > 0
        if len(_HOT_PROBE) >= _HOT_PROBE_CAP:
            _HOT_PROBE.clear()
        _HOT_PROBE[probe_key] = has_hot
    if not has_hot:
        return select_pairs(plain(df))
    hot = hot_keys(df, key, cap)
    hot_b = F.broadcast(hot)
    cold = select_pairs(plain(df.join(hot_b, key, "left_anti")))
    hot_p = select_pairs(
        tiled_self_pairs(df.join(hot_b, key, "left_semi"), key, order_col, cap)
    )
    return cold.unionByName(hot_p)

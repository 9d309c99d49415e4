"""Set-oriented idempotent upsert (SURVEY.md §2.1 S4-S6).

The reference upserts row-at-a-time: one Cypher ``MERGE`` per node
(src/etl/waste_items.py:366-373, src/etl/facilities.py:109-135) and per
edge (:383-413), ~1,600 sequential bolt round-trips per import — its main
physical weakness (SURVEY §4.1). The engine replaces that with ONE
full-outer join per batch: the incoming side shuffles once on the key, and
re-running the same merge is a no-op (idempotency, reference CLAUDE.md:80).

On Delta-capable clusters the same call maps to ``MERGE INTO``; this
implementation is pure Spark so it runs anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    existing: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    prefer_nonempty_cols: Sequence[str] = (),
    evolve_schema: bool = False,
) -> DataFrame:
    """MERGE semantics: match on `keys`; matched rows take incoming values,
    unmatched-incoming rows are inserted, unmatched-existing rows are kept.

    `prefer_nonempty_cols` reproduces the reference's conditional
    overwrite (src/etl/facilities.py:119-125 — ``CASE WHEN $v <> '' THEN
    $v ELSE old END``): empty-string incoming values preserve the existing
    value instead of clobbering it.

    ``evolve_schema`` is Delta's ``mergeSchema`` for this plain-Spark
    MERGE: columns the incoming batch carries that the target lacks are
    APPENDED to the output schema (incoming value where the incoming row
    matched or inserted, NULL on keep-existing rows). Off by default —
    silent schema drift should be an explicit choice; without it,
    unknown incoming columns are dropped, the target schema is closed.

    Scale notes: both sides shuffle on `keys` once (sort-merge full-outer);
    if the incoming batch is small relative to existing, AQE converts the
    plan. No per-row round-trips, no driver involvement.
    """
    # Alias-qualified references survive self-joins (incoming derived from
    # existing shares lineage; bare DataFrame[col] would be ambiguous).
    # The literal presence marker (not a key-null check) makes "incoming
    # row matched" detection correct even for NULL join keys, which
    # eqNullSafe deliberately matches.
    ex = existing.alias("_ex")
    inc = incoming.withColumn("_inc_present", F.lit(True)).alias("_inc")

    def e(c: str) -> F.Column:
        return F.col(f"_ex.{c}")

    def i(c: str) -> F.Column:
        return F.col(f"_inc.{c}")

    cond = None
    for k in keys:
        c = e(k).eqNullSafe(i(k))
        cond = c if cond is None else (cond & c)
    joined = ex.join(inc, cond, "full_outer")

    out = []
    for c in existing.columns:
        if c in keys:
            out.append(F.coalesce(i(c), e(c)).alias(c))
            continue
        if c not in incoming.columns:
            out.append(e(c).alias(c))
            continue
        newv = i(c)
        if c in prefer_nonempty_cols:
            newv = F.nullif(newv, F.lit(""))
        out.append(
            F.when(i("_inc_present").isNotNull(), F.coalesce(newv, e(c)))
            .otherwise(e(c))
            .alias(c)
        )
    if evolve_schema:
        for c in incoming.columns:
            if c not in existing.columns and c != "_inc_present":
                out.append(i(c).alias(c))
    return joined.select(out)


def upsert_edges(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """Edge MERGE (reference: src/etl/waste_items.py:383-396,404-413 —
    ``MERGE (src)-[:REL]->(dst)``): union then dedup on the edge identity
    (src, dst, rel_type). First-writer wins for any extra edge properties
    because dropDuplicates keeps one arbitrary-but-single row per key —
    callers needing deterministic property resolution use merge_upsert
    with a composite key instead."""
    return existing.unionByName(incoming, allowMissingColumns=True).dropDuplicates(
        ["src_uid", "dst_uid", "rel_type"]
    )

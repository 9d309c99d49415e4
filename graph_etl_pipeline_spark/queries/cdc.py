"""Change-data-capture operators: snapshot diffing and slowly-changing-
dimension history construction.

The reference's whole write path is an idempotent re-run (MERGE per row,
CLAUDE.md:80) — it recomputes the world and lets Neo4j absorb the delta.
At 100 TB the delta must be FIRST-CLASS: you diff the new snapshot
against the old one once, ship only the changed rows downstream, and
keep attribute history as validity intervals instead of overwriting.
These operators provide both halves:

- `cdc_snapshot_diff`: set-oriented diff of two table snapshots into
  insert/update/delete rows — ONE full-outer join shuffled on the key
  (each side map-side pruned to key + compared columns), output
  proportional to the churn, not the table.
- `scd2_history`: type-2 dimension build from an event stream — change
  detection (lag) and validity intervals (lead) are two window passes
  over the SAME (key, ts) partitioning, so the second window reuses the
  first's exchange: one shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_etl_pipeline_spark.io import table
from graph_etl_pipeline_spark.registry import register


@register(
    "cdc_snapshot_diff",
    oracle="""
    WITH old_snap AS (
        SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 10 <> 0
    ),
    new_snap AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100 ELSE c_acctbal END
                   AS c_acctbal
        FROM customer WHERE c_custkey % 13 <> 0
    )
    SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'insert'
                WHEN n.c_custkey IS NULL THEN 'delete'
                ELSE 'update' END AS change,
           o.c_acctbal AS old_acctbal,
           n.c_acctbal AS new_acctbal
    FROM old_snap o FULL OUTER JOIN new_snap n ON o.c_custkey = n.c_custkey
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
    """,
    tags=("cdc", "join"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff → changed-row stream. Two deterministic snapshots
    are derived from `customer` (old: keys ∤10; new: keys ∤13 with
    ∣7-key balances shifted — so all three change kinds occur), then
    diffed with one full-outer join on the key: left-null → insert,
    right-null → delete, null-safe value inequality → update, unchanged
    rows dropped. The double arithmetic is a single IEEE add, identical
    in both engines. At scale the join shuffles only (key, compared
    columns); column pruning reaches both scans."""
    c = table(spark, sf_dir, "customer")
    old_snap = (
        c.filter(F.col("c_custkey") % 10 != 0)
        .select("c_custkey", "c_acctbal")
        .alias("o")
    )
    new_snap = (
        c.filter(F.col("c_custkey") % 13 != 0)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100)
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
        )
        .alias("n")
    )
    joined = old_snap.join(
        new_snap, F.col("o.c_custkey") == F.col("n.c_custkey"), "full_outer"
    )
    return joined.filter(
        F.col("o.c_custkey").isNull()
        | F.col("n.c_custkey").isNull()
        | ~(F.col("o.c_acctbal").eqNullSafe(F.col("n.c_acctbal")))
    ).select(
        F.coalesce(F.col("o.c_custkey"), F.col("n.c_custkey")).alias("c_custkey"),
        F.when(F.col("o.c_custkey").isNull(), "insert")
        .when(F.col("n.c_custkey").isNull(), "delete")
        .otherwise("update")
        .alias("change"),
        F.col("o.c_acctbal").alias("old_acctbal"),
        F.col("n.c_acctbal").alias("new_acctbal"),
    )


@register(
    "scd2_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, value,
               LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events WHERE event_type = 'purchase'
    ),
    changes AS (
        SELECT user_id, ts, event_id, value FROM ordered
        WHERE prev IS DISTINCT FROM value
    )
    SELECT user_id, value AS attr_value, ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           LEAD(ts) OVER w IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("cdc", "window"),
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension history from the purchase-event stream: collapse
    consecutive identical attribute values (lag change-detection), then
    derive [valid_from, valid_to) intervals + an is_current flag (lead).
    Both windows share PARTITION BY user_id ORDER BY (ts, event_id), so
    Catalyst plans ONE exchange — the filter between them preserves the
    partitioning. This is how mutable entity state (the reference's
    `updated_at` overwrite, src/etl/waste_items.py:370-372) becomes
    queryable point-in-time history at scale."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            "event_id",
            "value",
            F.lag("value").over(w).alias("prev"),
        )
        .filter(~F.col("prev").eqNullSafe(F.col("value")))
    )
    return changes.select(
        "user_id",
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "cdc_apply_changefeed",
    oracle="""
    WITH feed AS (
        SELECT o_custkey AS key,
               CASE o_orderstatus WHEN 'F' THEN 'D' ELSE 'U' END AS op,
               o_totalprice AS payload
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC
            ) AS rn FROM orders
        ) WHERE rn = 1
    )
    SELECT c.c_custkey, c.c_name,
           CASE WHEN f.op = 'U' THEN f.payload END AS last_price
    FROM customer c LEFT JOIN feed f ON f.key = c.c_custkey
    WHERE f.op IS NULL OR f.op <> 'D'
    """,
    tags=("cdc", "sink"),
)
def cdc_apply_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply an I/U/D change feed to a snapshot — the consumer side of CDC
    (cdc_snapshot_diff is the producer side): deletes remove snapshot
    rows, updates overwrite the payload, inserts add new keys. The feed
    here is derived deterministically from each customer's latest order
    (finalized status 'F' → delete, open/pending → update with the order
    total); the testdata feed is referentially intact so the INSERT leg
    can't fire against it — tests/test_operators.py exercises I/U/D
    together on a planted fixture via apply_changefeed.

    Scale shape: reduce the feed to one row per key (one window exchange
    — CDC streams are key-skewed, so the reduction happens before the
    join), then a single key-partitioned join + filter applies all op
    kinds in one pass; no per-op sub-joins.

    The SNAPSHOT defines the key universe here (insert=False → LEFT
    join, exactly the oracle's shape) — the same seed-keyed discipline
    the newer-wins streaming merge follows, so a feed carrying orphan
    keys can never silently diverge from the oracle. The insert leg
    (full-outer) is the library option, fixture-tested."""
    snap = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    feed = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("key"),
            F.when(F.col("o_orderstatus") == "F", "D").otherwise("U").alias("op"),
            F.col("o_totalprice").alias("payload"),
        )
    )
    return apply_changefeed(snap, feed, key_col="c_custkey", insert=False)


def apply_changefeed(
    snap: DataFrame,
    feed: DataFrame,
    key_col: str,
    insert: bool = True,
    payload_col: str = "last_price",
) -> DataFrame:
    """Library form: snapshot ⋈ (one-row-per-key feed) with op semantics
    D=drop, U=update payload, and — when ``insert`` — I=insert new key
    (feed keys absent from the snapshot survive the full-outer leg with
    their payload; with insert=False the snapshot's key set is closed and
    orphan feed keys are dropped).

    Generic over the snapshot schema (ADVICE r5): every non-key snapshot
    column is carried through unchanged (NULL on the insert leg, which has
    no snapshot attributes), and the feed payload lands in ``payload_col``
    — NULL for rows no U/I touched. The feed side must expose
    (key, op, payload)."""
    s = snap.alias("_snap")
    j = s.join(
        feed.alias("_feed"),
        F.col(f"_snap.{key_col}") == F.col("_feed.key"),
        "full_outer" if insert else "left",
    )
    kept = j.filter(F.col("op").isNull() | (F.col("op") != "D"))
    cols = [
        F.coalesce(F.col(f"_snap.{key_col}"), F.col("_feed.key")).alias(key_col)
    ]
    cols += [F.col(f"_snap.{c}").alias(c) for c in snap.columns if c != key_col]
    cols.append(
        F.when(F.col("op").isin("U", "I"), F.col("payload")).alias(payload_col)
    )
    return kept.select(cols)


@register(
    "join_scd2_asof",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, value,
               LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events WHERE event_type = 'purchase'
    ),
    changes AS (
        SELECT user_id, ts, event_id, value FROM ordered
        WHERE prev IS DISTINCT FROM value
    ),
    dim AS (
        SELECT user_id, value AS attr_value, ts AS valid_from,
               LEAD(ts) OVER w AS valid_to
        FROM changes
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT f.event_id, f.user_id, f.ts, d.attr_value, d.valid_from
    FROM events f JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    WHERE f.event_type = 'click'
    """,
    tags=("cdc", "join", "temporal"),
)
def join_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL dimension lookup — the join every SCD2 table exists to
    serve and the half scd2_history alone doesn't prove: each fact row
    (clicks) joins the dimension VERSION that was valid at the fact's
    event time (fact.ts ∈ [valid_from, valid_to)), so late-arriving
    analytics reconstruct the world as it was, not as it is. The SCD2
    versions come from the same change-detection chain as scd2_history
    (shared derivation, inlined here so both sides stay one plan).

    Scale shape: this is NOT a range join — both sides hash-partition
    on user_id (one equi-join exchange each) and the validity predicate
    is a residual filter; per-key fanout is the key's VERSION COUNT
    (bounded by change frequency, typically ≪ 100), never a
    time-bucket fanout, which is why warehouses can run SCD2 lookups
    at fact-table scale. Versions-per-key skew is the same hot-key
    story as every per-user operator here (join_salted_skew is the
    escape hatch). Non-matching facts (clicks before the first
    purchase version) are dropped by the inner join — the LEFT variant
    adds a null-version row, same plan."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        purch.select(
            "user_id", "ts", "event_id", "value",
            F.lag("value").over(w).alias("prev"),
        )
        .filter(~F.col("prev").eqNullSafe(F.col("value")))
    )
    dim = changes.select(
        "user_id",
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    facts = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return facts.join(dim, "user_id").filter(
        (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
    ).select("event_id", "user_id", "ts", "attr_value", "valid_from")


# --- Log compaction with tombstone retention -------------------------------------
COMPACT_TOMBSTONE_DAYS = 30  # tombstones younger than this survive compaction


@register(
    "cdc_tombstone_compaction",
    oracle=f"""
    WITH latest AS (
        SELECT o_custkey AS key,
               o_orderstatus = 'F' AS is_tombstone,
               CAST(round(o_totalprice * 100) AS BIGINT) AS payload_cents,
               o_orderdate AS ts
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC
            ) AS rn FROM orders
        ) WHERE rn = 1
    ),
    horizon AS (
        SELECT MAX(o_orderdate) - INTERVAL {COMPACT_TOMBSTONE_DAYS} DAY AS cutoff
        FROM orders
    )
    SELECT key, is_tombstone,
           CASE WHEN is_tombstone THEN NULL ELSE payload_cents END AS payload_cents,
           ts
    FROM latest, horizon
    WHERE NOT is_tombstone OR ts >= cutoff
    """,
    tags=("cdc", "compaction", "sink"),
)
def cdc_tombstone_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAFKA-STYLE LOG COMPACTION with tombstone retention — the third
    leg of the CDC family (cdc_snapshot_diff produces a feed,
    cdc_apply_changefeed consumes one; this one compacts the LOG
    itself): per key keep only the LATEST record; if that record is a
    delete marker (tombstone), keep the tombstone only while it is
    younger than the retention horizon — old tombstones are purged and
    the key vanishes from the compacted segment. Dropping tombstones
    too early is the classic compaction bug (a lagging consumer never
    learns the delete and resurrects the key), which is why retention
    is a first-class parameter and the tombstone rows are in the
    OUTPUT, not just subtracted.

    The changelog is derived deterministically from orders (latest
    order per customer; finalized status = tombstone); the horizon is
    max(o_orderdate) − {COMPACT_TOMBSTONE_DAYS} days, computed in-plan
    as a 1-row broadcast — both engines derive it identically, no
    wall-clock in the query.

    Scale shape: compaction is ONE per-key window reduction (CDC logs
    are key-skewed, so the reduce happens before anything joins), the
    horizon is a 1-row cross broadcast, and tombstone GC is a map-side
    filter — segment in, segment out, O(keys) output. This is exactly
    the periodic-compactor job shape over a 100 TB changelog: shuffle
    once on key, no driver involvement."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    latest = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("key"),
            (F.col("o_orderstatus") == "F").alias("is_tombstone"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("payload_cents"),
            F.col("o_orderdate").alias("ts"),
        )
    )
    horizon = F.broadcast(
        o.agg(
            (
                F.max("o_orderdate") - F.expr(f"INTERVAL {COMPACT_TOMBSTONE_DAYS} DAY")
            ).alias("cutoff")
        )
    )
    return (
        latest.crossJoin(horizon)
        .filter(~F.col("is_tombstone") | (F.col("ts") >= F.col("cutoff")))
        .select(
            "key",
            "is_tombstone",
            F.when(~F.col("is_tombstone"), F.col("payload_cents")).alias(
                "payload_cents"
            ),
            "ts",
        )
    )

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

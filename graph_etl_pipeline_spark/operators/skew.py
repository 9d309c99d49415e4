"""Skew-mitigation utilities (SURVEY.md §4.2 / 100 TB design).

AQE's skew-join splitting handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.py); these helpers
cover the two places AQE can't: skewed AGGREGATION keys (two-phase salted
aggregation) and broadcast-ineligible skewed joins (salt × replicate).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[Column],
    partial_aggs: Sequence[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: phase 1 groups on (keys + random salt) so a
    hot key spreads over `salt_buckets` reducers; phase 2 merges partials
    on the true keys. `partial_aggs` must be the phase-1 forms whose
    outputs the phase-2 `aggs` consume (classic sum-of-sums /
    sum-of-counts decomposition).

    Example:
        salted_agg(df, ["k"],
                   aggs=[F.sum("s").alias("total"), F.sum("c").alias("n")],
                   partial_aggs=[F.sum("v").alias("s"), F.count("*").alias("c")])
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skewed equi-join: salt the (big, skewed) left side randomly and
    REPLICATE the right side across all salt values, then join on
    (key, salt). Turns one hot partition into `salt_buckets` even ones at
    the cost of duplicating the right side — use when the right side is
    too big to broadcast but small enough to replicate."""
    salted_left = left.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    replicated_right = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    return salted_left.join(replicated_right, [key, "_salt"]).drop("_salt")

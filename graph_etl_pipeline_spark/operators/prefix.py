"""Scalable exclusive prefix sums over a global ordering.

A running total over `ORDER BY key` is the canonical scale trap: Spark
plans one unbounded window partition — a single task sorting the whole
table. The two-level decomposition keeps every window partition bounded:

  1. rows bucket by `key DIV bucket` (a deterministic key, so results
     are partitioning-independent — `spark_partition_id` would not be);
  2. per-bucket subtotals get their exclusive prefix via a window over
     the BUCKET table (n/bucket rows — at 100 TB choose `bucket` so the
     bucket count stays one comfortable task, ~1e6 rows);
  3. each row's offset = its bucket's prefix (broadcast join) + the
     exclusive running sum inside its bounded bucket partition.

All arithmetic is int64 (`pmod`-then-`div`, never `/` which widens to
double and loses exactness past 2^53), so offsets are hash-identical
across engines, partitionings, and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exclusive_prefix_sum(
    df: DataFrame,
    weight_col: str,
    order_col: str = "doc_id",
    bucket: int = 256,
    out_col: str = "global_offset",
) -> DataFrame:
    """Append `out_col` = sum of `weight_col` over all rows strictly
    before this one in `order_col` order. `order_col` must be unique
    int64; `weight_col` must be int64. Adds no other columns."""
    bucketed = df.withColumn(
        "_bkt",
        F.expr(f"({order_col} - pmod({order_col}, {bucket})) div {bucket}"),
    )
    bucket_prefix = (
        bucketed.groupBy("_bkt")
        .agg(F.sum(weight_col).alias("_bkt_total"))
        .withColumn(
            "_bkt_prefix",
            F.coalesce(
                F.sum("_bkt_total").over(
                    Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_bkt", "_bkt_prefix")
    )
    within = F.coalesce(
        F.sum(weight_col).over(
            Window.partitionBy("_bkt")
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        bucketed.join(F.broadcast(bucket_prefix), "_bkt")
        .withColumn(out_col, (F.col("_bkt_prefix") + within).cast("long"))
        .drop("_bkt", "_bkt_prefix")
    )

"""Table access for the driver test data (parquet star schema).

Analogue of the reference's scan layer (src/etl/waste_items.py:251-281
CSV scan, src/etl/facilities.py:41-76 JSON scan) — but columnar,
predicate-pushdown-friendly parquet reads instead of in-memory dicts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# region=5, nation=25 rows are constant regardless of SF).
BROADCAST_TABLES = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. Pins session timezone to UTC so timestamp
    values collect identically to the DuckDB oracle regardless of who
    built the session (the driver owns it in verification runs).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright; we read it as raw nanos
    (legacy.parquet.nanosAsLong) and rebuild a proper TimestampType column.
    The data is micro-precision (every value ≡ 0 mod 1000 ns) so the
    conversion is lossless.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)"))
        ).select("event_id", "ts", "user_id", "event_type", "value", "props")
    return spark.read.parquet(path)


def tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [table(spark, sf_dir, n) for n in names]

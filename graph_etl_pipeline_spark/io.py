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
    built the session (the driver owns it in verification runs)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [table(spark, sf_dir, n) for n in names]

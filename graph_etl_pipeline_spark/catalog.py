"""Client API surface (SURVEY.md §2.11) — the engine's analogue of the
reference's Neo4jDatabase class (reference: src/db/neo4j_db.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_etl_pipeline_spark.io import TABLES, table
from graph_etl_pipeline_spark.session import is_connected  # noqa: F401  (re-export)


def query(spark: SparkSession, sql: str, **params) -> list[dict]:
    """Parameterized SQL in, list-of-dicts out (reference:
    src/db/neo4j_db.py:93-106 `query(cypher, params)`).

    Parameters bind as literals via spark.sql's named-parameter support —
    injection-safe like the reference's $param Cypher (SURVEY §4.1)."""
    df = spark.sql(sql, args=params) if params else spark.sql(sql)
    return [row.asDict(recursive=True) for row in df.collect()]


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Expose the test tables as temp views so `query()` can address them
    by name (the engine's catalog bootstrap)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def get_stats(spark: SparkSession, sf_dir: str) -> dict:
    """Catalog walk + counts (reference: src/db/neo4j_db.py:122-149
    get_stats — `CALL db.labels()` + per-label count + edge count). The
    reference's 1+N+1 sequential round-trips become N parallel jobs over
    cached metadata; per-table parquet row counts come from footer
    statistics, not scans."""
    # plain reads (no parallelism floor / broadcast hints) so counts come
    # from parquet footer metadata, not scans; nanosAsLong lets the events
    # nano-timestamp file load for counting
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    counts = {
        name: spark.read.parquet(f"{sf_dir}/{name}.parquet").count()
        for name in TABLES
    }
    return {
        "tables": counts,
        "total_rows": sum(counts.values()),
        "n_tables": len(counts),
    }


def clear_all(spark: SparkSession) -> int:
    """S8 truncate-all (reference: src/db/neo4j_db.py:151-158 — `MATCH (n)
    DETACH DELETE n`). Engine-side: drop every registered temp view;
    table storage is immutable test data so views are the mutable layer."""
    dropped = 0
    for name in list(spark.catalog.listTables()):
        if name.isTemporary:
            spark.catalog.dropTempView(name.name)
            dropped += 1
    return dropped


def sample(spark: SparkSession, sf_dir: str, name: str, n: int = 10) -> DataFrame:
    """LIMIT-n sample (reference README.md:60 sample queries)."""
    return table(spark, sf_dir, name).limit(n)

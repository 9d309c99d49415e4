"""Source/scan operators (SURVEY.md §2.1 S1-S3).

The reference reads CSV with embedded-newline cells into dicts
(src/etl/waste_items.py:251-281) and nested JSON into flattened records
(src/etl/facilities.py:41-76). Spark-side: the CSV scan exercises
header + multiLine + quote handling; the JSON path uses from_json on a
string column (schema-on-read, no driver-side parsing)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_etl_pipeline_spark.io import table
from graph_etl_pipeline_spark.registry import register

_CSV_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".cache", "csv")


def _clean_stale_csv_dirs() -> None:
    """Drop cache dirs left by dead processes so repeated bench/verify runs
    don't accumulate CSV copies (dirs are keyed {hash}-{pid}; a pid that no
    longer exists can't race us). Shares io.py's portable liveness + age
    logic so recycled pids can't pin dirs forever."""
    from graph_etl_pipeline_spark.io import _reap_stale_pid_dirs

    _reap_stale_pid_dirs(_CSV_CACHE)


@register(
    "src_csv_scan",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer
    """,
    tags=("source", "csv"),
)
def src_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: header-mapped CSV scan (reference: src/etl/waste_items.py:251-281
    — DictReader keyed on headers; reference cells contain embedded
    newlines → multiLine + quote options). Round-trips the customer table
    through CSV with an explicit schema — values must survive exactly
    (the oracle reads the original parquet). The write keeps the source's
    partitioning (one CSV part-file per task — a single-file coalesce(1)
    would serialize the write at scale); the read globs the directory."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    import hashlib

    # key by full-path hash + pid: distinct data roots sharing a basename
    # must not collide, and concurrent processes must not race on one dir
    _clean_stale_csv_dirs()
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    dest = os.path.join(_CSV_CACHE, f"{key}-{os.getpid()}", "customer")
    c.write.mode("overwrite").option("header", True).option("quoteAll", True).csv(dest)
    return (
        spark.read.schema("c_custkey bigint, c_name string, c_acctbal double, c_mktsegment string")
        .option("header", True)
        .option("multiLine", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(dest)
    )


@register(
    "src_json_flatten",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    """,
    tags=("source", "json"),
)
def src_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: nested-JSON parse + project (reference: src/etl/facilities.py:41-76
    — json.load + flatten of {uuid: [records...]}). The events.props JSON
    string is parsed executor-side with from_json — schema-on-read, fully
    distributed, no driver materialization."""
    ev = table(spark, sf_dir, "events")
    parsed = F.from_json(ev.props, "k INT")
    return ev.select("event_id", "event_type", parsed.getField("k").alias("k_val"))

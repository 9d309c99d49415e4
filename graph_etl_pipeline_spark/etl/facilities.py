"""Facility ETL (reference: src/etl/facilities.py, 192 LoC): nested JSON
{uuid: [facility-records]} → deduplicated Facility nodes with
merge-most-complete semantics and prefer-non-empty upsert."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_etl_pipeline_spark.functions.hashing import uid_hash
from graph_etl_pipeline_spark.sinks.upsert import merge_upsert

FIELDS = ("name", "address", "opening_hours", "contact", "additional_info", "link")


def load_facilities(spark: SparkSession, filepath: str) -> DataFrame:
    """S2 nested-JSON scan + flatten + D2 merge-most-complete (reference:
    facilities.py:41-76).

    The reference's {uuid: [records]} dict becomes: read whole JSON as one
    map, explode the per-uuid arrays, then group by name keeping the
    FIRST non-empty value per field. "First" is made explicit with a
    deterministic ordering column (uuid, array position) — the reference
    relied on Python dict iteration order (SURVEY §7 risk list).
    """
    schema = "map<string, array<struct<" + ",".join(f"{f}: string" for f in FIELDS) + ">>>"
    raw = spark.read.text(filepath, wholetext=True)
    records = (
        raw.select(F.from_json("value", schema).alias("m"))
        .select(F.explode("m").alias("uuid", "recs"))
        .select("uuid", F.posexplode("recs").alias("pos", "rec"))
        .select("uuid", "pos", *[F.trim(F.col(f"rec.{f}")).alias(f) for f in FIELDS])
        .filter(F.col("name").isNotNull() & (F.col("name") != ""))  # reference :62-64
        # zero-pad the array position so the string ordering is numeric
        # ("#000010" after "#000002"); bare int-to-string would sort
        # position 10 before 2 and crown the wrong record
        .withColumn("ord", F.concat_ws("#", "uuid", F.lpad(F.col("pos").cast("string"), 6, "0")))
    )
    first_nonempty = [
        F.expr(f"min_by({f}, ord) FILTER (WHERE {f} IS NOT NULL AND {f} <> '')").alias(f)
        for f in FIELDS
        if f != "name"
    ]
    return records.groupBy("name").agg(*first_nonempty)


def import_facilities(
    spark: SparkSession,
    filepath: str,
    existing: DataFrame | None = None,
    dry_run: bool = False,
):
    """Reference facilities.py:79-143: load → dedup-merge → idempotent
    upsert with conditional overwrite (non-empty incoming wins, empty
    preserves existing — reference :119-125). One set-oriented merge
    instead of one MERGE statement per facility."""
    incoming = load_facilities(spark, filepath).select(
        uid_hash("name").alias("uid"), "name", *[f for f in FIELDS if f != "name"]
    )
    stats = incoming.agg(F.count(F.lit(1)).alias("facilities_loaded")).collect()[0]
    if dry_run:
        return None, stats
    existing = existing if existing is not None else incoming.limit(0)
    merged = merge_upsert(
        existing,
        incoming,
        keys=["uid"],
        prefer_nonempty_cols=[f for f in FIELDS if f != "name"],
    )
    return merged, stats

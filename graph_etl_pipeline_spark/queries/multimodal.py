"""Multimodal-column operators (driver north-star: image/audio/video as
opaque binary columns with typed metadata).

The container has no image/audio codecs, so the DECODE step is a
deterministic fake behind the same interface a real decoder would use
(see graph_etl_pipeline_spark.multimodal.decode). What IS real and tested
here: the binary column representation, the metadata struct schema, the
Arrow-batched mapInPandas plumbing (batch iterator in/out, schema
declared up front), and the partition behavior — exactly the pieces that
matter at 100 TB, where the decode UDF is swapped for PIL/ffmpeg and the
plan around it is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_etl_pipeline_spark.io import table
from graph_etl_pipeline_spark.operators.multimodal import binary_features_df
from graph_etl_pipeline_spark.registry import register


@register(
    "mm_binary_features",
    oracle="""
    WITH ascii_docs AS (
        SELECT doc_id, regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g') AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(octet_length(CAST(t AS BLOB)) AS INTEGER) AS blob_len,
           ascii(substr(t, 1, 1)) AS head_byte,
           ascii(substr(t, length(t), 1)) AS tail_byte,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))),
                (a, b) -> a + b) % 2147483647 AS BIGINT) AS checksum
    FROM ascii_docs
    """,
    tags=("multimodal", "llm", "udf"),
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline: text bytes stand in for an opaque
    media blob (UTF-8 cast — the oracle recomputes the same features from
    the string side, proving the bytes survive the Arrow round-trip
    exactly). mapInPandas = per-partition batch iterator, the pattern for
    any decoder that needs Python libraries."""
    d = table(spark, sf_dir, "documents")
    # Non-ASCII chars are multi-byte in UTF-8 while the oracle's ascii()
    # is per-codepoint — normalize both sides to pure ASCII ('?') so byte
    # and char arithmetic agree regardless of corpus content.
    ascii_text = F.regexp_replace(d.text, r"[^\x00-\x7F]", "?")
    blobs = d.select("doc_id", F.encode(ascii_text, "UTF-8").alias("blob"))
    return binary_features_df(blobs)


@register(
    "mm_metadata_struct",
    oracle="""
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           lang AS meta_lang,
           octet_length(CAST(text AS BLOB)) > 256 AS is_large
    FROM documents
    """,
    tags=("multimodal", "llm"),
)
def mm_metadata_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata travelling beside the opaque blob: a struct column
    (mime, n_bytes, lang) built at ingest, then projected/filtered WITHOUT
    touching blob bytes — the scan reads only the metadata sub-columns
    (columnar pruning is what makes 100 TB of media browsable)."""
    d = table(spark, sf_dir, "documents")
    meta = F.struct(
        F.lit("text/plain").alias("mime"),
        F.length(F.encode(d.text, "UTF-8")).cast("bigint").alias("n_bytes"),
        d.lang.alias("meta_lang"),
    )
    enriched = d.select("doc_id", F.encode(d.text, "UTF-8").alias("blob"), meta.alias("meta"))
    return enriched.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.meta_lang").alias("meta_lang"),
        (F.col("meta.n_bytes") > 256).alias("is_large"),
    )

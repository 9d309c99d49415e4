"""Queries exercising the multimodal frame sampler and the salted
skew-mitigation operators against SQL oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_etl_pipeline_spark.functions.numeric import dec
from graph_etl_pipeline_spark.io import table
from graph_etl_pipeline_spark.operators.multimodal import frame_sample_df
from graph_etl_pipeline_spark.operators.skew import salted_agg
from graph_etl_pipeline_spark.queries._sql import osum, sdec
from graph_etl_pipeline_spark.registry import register

N_FRAMES, FRAME_SIZE = 4, 16


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g') AS t
        FROM documents
    ),
    sized AS (
        SELECT doc_id, t, length(t) AS L, greatest(length(t) // {N_FRAMES}, 1) AS stride
        FROM f
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_idx,
           length(substr(t, CAST(i * stride + 1 AS INTEGER), {FRAME_SIZE})) AS frame_len,
           ascii(substr(t, CAST(i * stride + 1 AS INTEGER), 1)) AS frame_head
    FROM sized, generate_series(0, {N_FRAMES - 1}) AS s(i)
    WHERE i * stride < L
    """,
    tags=("multimodal", "llm", "udf"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over an opaque blob column: evenly
    strided fixed-size windows via the Arrow mapInPandas sampler (the
    oracle recomputes the same windows with substr over the source text —
    ASCII, so byte and char offsets agree). Swap the stub body for
    ffmpeg/av keyframe extraction; stride math and schema stay."""
    d = table(spark, sf_dir, "documents")
    # same ASCII normalization as mm_binary_features: byte offsets and
    # char offsets must agree for the oracle's substr windows
    ascii_text = F.regexp_replace(d.text, r"[^\x00-\x7F]", "?")
    blobs = d.select("doc_id", F.encode(ascii_text, "UTF-8").alias("blob"))
    return frame_sample_df(blobs, n_frames=N_FRAMES, frame_size=FRAME_SIZE)


@register(
    "agg_salted_skew",
    oracle=f"""
    SELECT l_returnflag,
           {osum(sdec('l_extendedprice'), "total_price")},
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "skew"),
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a deliberately low-cardinality
    (hot) grouping key. Because the partial sums are exact decimals, the
    salt is invisible in the result — the oracle is the plain GROUP BY.
    At scale this is the pattern for hot-key aggregations AQE can't fix
    (a single group key hashing to one reducer)."""
    li = table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        partial_aggs=[
            F.sum(dec("l_extendedprice")).alias("_s"),
            F.count(F.lit(1)).alias("_c"),
        ],
        aggs=[
            F.sum("_s").cast("double").alias("total_price"),
            F.sum("_c").alias("n_items"),
        ],
    )
    return out

"""Streaming-backed contract queries (SURVEY.md §2.9 T1): a REAL
Structured Streaming execution (readStream → watermark → windowed agg →
availableNow trigger → memory sink) whose finished result is returned as
a batch DataFrame — so the DuckDB oracle checks the streaming path
itself, not a batch stand-in."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from graph_etl_pipeline_spark.queries._sql import osum, sdec
from graph_etl_pipeline_spark.registry import register
from graph_etl_pipeline_spark.streaming.jobs import (
    events_stream,
    run_to_memory,
    tumbling_aggregate,
)


@register(
    "stream_tumbling_hourly",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {osum(sdec('value'), "sum_value")}
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 executed through the streaming engine. The single-file source
    arrives as one micro-batch, so the 2-hour watermark drops nothing and
    the complete-mode result must equal the batch oracle exactly. (With
    multi-file arrival the watermark starts evicting finalized windows —
    covered in tests/test_streaming.py.)"""
    stream = events_stream(spark, sf_dir)
    return run_to_memory(
        tumbling_aggregate(stream, window="1 hour", watermark="2 hours"),
        name=f"stream_tumbling_{uuid.uuid4().hex[:8]}",
    )

"""Streaming ≡ batch equivalence (SURVEY.md §2.9): the streaming jobs must
produce exactly the batch plans' results when run to completion with
availableNow over the same files."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from graph_etl_pipeline_spark.io import table
from graph_etl_pipeline_spark.streaming.jobs import (
    events_stream,
    incremental_upsert,
    run_to_memory,
    session_aggregate,
    tumbling_aggregate,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, sf_dir):
    stream = events_stream(spark, sf_dir)
    result = run_to_memory(
        tumbling_aggregate(stream), f"tumbling_{uuid.uuid4().hex[:8]}"
    )

    ev = table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(result, cols) == _rows(batch, cols)


def test_session_stream_produces_sessions(spark, sf_dir):
    stream = events_stream(spark, sf_dir)
    result = run_to_memory(
        session_aggregate(stream), f"sessions_{uuid.uuid4().hex[:8]}"
    )
    rows = result.collect()
    assert len(rows) > 0
    ev_count = table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == ev_count


def test_incremental_upsert_stream(spark, sf_dir):
    """T2: streaming merge over micro-batches ends in the same state as one
    batch merge, and replaying is a no-op (idempotency)."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    existing = ev.filter(ev.event_id % 2 == 0)

    stream = events_stream(spark, sf_dir).select("event_id", "user_id", "value")
    with tempfile.TemporaryDirectory() as ckpt:
        final = incremental_upsert(
            stream, existing, keys=["event_id"], checkpoint_dir=ckpt,
            table_name=f"upsert_{uuid.uuid4().hex[:8]}",
        )
        assert final.count() == ev.count()
        # re-merging the full table again changes nothing
        from graph_etl_pipeline_spark.sinks.upsert import merge_upsert

        again = merge_upsert(final, ev, keys=["event_id"])
        assert again.count() == ev.count()

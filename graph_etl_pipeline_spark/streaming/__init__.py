from graph_etl_pipeline_spark.streaming.jobs import (  # noqa: F401
    events_stream,
    incremental_upsert,
    run_to_memory,
    session_aggregate,
    tumbling_aggregate,
)

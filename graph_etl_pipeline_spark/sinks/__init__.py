from graph_etl_pipeline_spark.sinks.upsert import merge_upsert, upsert_edges  # noqa: F401

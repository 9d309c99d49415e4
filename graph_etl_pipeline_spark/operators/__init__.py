from graph_etl_pipeline_spark.operators import multimodal, skew  # noqa: F401

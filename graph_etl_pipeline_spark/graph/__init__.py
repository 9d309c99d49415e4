from graph_etl_pipeline_spark.graph.model import PropertyGraph  # noqa: F401
from graph_etl_pipeline_spark.graph.build import star_graph  # noqa: F401

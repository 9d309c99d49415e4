"""graph_etl_pipeline_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference system Knaeckebrothero/Graph-ETL-Pipeline
(a Python + Neo4j graph-ETL pipeline), extended with the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
required for large-scale training-data work.

Architecture: declarative DataFrame/SQL plans optimized by Catalyst; the
graph layer is a vertex/edge DataFrame decomposition (GraphX model, exposed
GraphFrames-style); streaming is Structured Streaming over the same
operators. Zero custom Catalyst rules by design (SURVEY.md §4.2).
"""

__version__ = "0.1.0"

from graph_etl_pipeline_spark.registry import all_queries, oracle_map  # noqa: F401
from graph_etl_pipeline_spark.session import get_spark  # noqa: F401

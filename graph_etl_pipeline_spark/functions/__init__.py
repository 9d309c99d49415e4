from graph_etl_pipeline_spark.functions.numeric import dec, dsum, davg  # noqa: F401
from graph_etl_pipeline_spark.functions.hashing import uid_hash  # noqa: F401

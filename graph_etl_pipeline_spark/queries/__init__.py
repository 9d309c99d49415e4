"""Import every query module so its @register side effects populate the
registry. Add new operator families here as they land."""

from graph_etl_pipeline_spark.queries import (  # noqa: F401
    aggregates,
    cleaning,
    dedup,
    graph_queries,
    joins,
    multimodal,
    relational,
    similarity,
    sinks,
    sources,
    textops,
    windows,
)

"""Import every query module so its @register side effects populate the
registry. Add new operator families here as they land."""

from graph_etl_pipeline_spark.queries import (  # noqa: F401
    aggregates,
    cleaning,
    graph_queries,
    joins,
    relational,
    sinks,
    sources,
    windows,
)

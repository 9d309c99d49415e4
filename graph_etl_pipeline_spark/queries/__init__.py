"""Import every query module so its @register side effects populate the
registry. Add new operator families here as they land."""

from graph_etl_pipeline_spark.queries import (  # noqa: F401
    aggregates,
    cdc,
    cleaning,
    composite,
    curation,
    dedup,
    extraction,
    geo,
    graph_queries,
    joins,
    mm_skew,
    multimodal,
    quality,
    relational,
    similarity,
    sinks,
    sources,
    streaming_queries,
    textops,
    windows,
)

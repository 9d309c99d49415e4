from graph_etl_pipeline_spark.etl.waste_items import (  # noqa: F401
    import_waste_items,
    load_waste_items,
    parse_disposal_targets,
)
from graph_etl_pipeline_spark.etl.facilities import (  # noqa: F401
    import_facilities,
    load_facilities,
)

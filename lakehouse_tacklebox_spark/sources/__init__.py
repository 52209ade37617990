from lakehouse_tacklebox_spark.sources.catalog import (  # noqa: F401
    TABLE_NAMES,
    load_tables,
    maybe_broadcast,
    normalize_event_ts,
    register_views,
)

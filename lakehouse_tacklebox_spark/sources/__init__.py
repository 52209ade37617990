from lakehouse_tacklebox_spark.sources.catalog import TABLE_NAMES, load_tables, register_views  # noqa: F401

from lakehouse_tacklebox_spark.observability.runlogger import RunLogger  # noqa: F401

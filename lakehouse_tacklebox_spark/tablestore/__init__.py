from lakehouse_tacklebox_spark.tablestore.table import TackleTable  # noqa: F401

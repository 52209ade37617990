from lakehouse_tacklebox_spark.operators import dedup, scd, similarity, text  # noqa: F401

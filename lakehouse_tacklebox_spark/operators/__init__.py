from lakehouse_tacklebox_spark.operators import dedup, scd, similarity, text  # noqa: F401
from lakehouse_tacklebox_spark.operators.asof import asof_join  # noqa: F401

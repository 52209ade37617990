from lakehouse_tacklebox_spark.plans.profiler import profile  # noqa: F401
from lakehouse_tacklebox_spark.plans.query_analyzer import extract_query_profile  # noqa: F401

from lakehouse_tacklebox_spark.benchmark.runner import BenchmarkResult, BenchmarkRunner  # noqa: F401
from lakehouse_tacklebox_spark.benchmark.replay import replay_with_offsets  # noqa: F401

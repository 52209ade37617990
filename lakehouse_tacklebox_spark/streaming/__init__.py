from lakehouse_tacklebox_spark.streaming.apply_changes import (  # noqa: F401
    apply_changes,
    apply_changes_batch,
)
from lakehouse_tacklebox_spark.streaming.ingest import file_stream, stream_to_table  # noqa: F401
from lakehouse_tacklebox_spark.streaming.monitor import StreamMetricsCollector  # noqa: F401
from lakehouse_tacklebox_spark.streaming.stateful import (  # noqa: F401
    stateful_dedup,
    stateful_running_agg,
)

"""Streaming observability (SURVEY §2.9 ST8, §2.1 S16).

StreamingQueryListener-based metrics capture, re-expressing the
reference's stream monitor (40-observability/stream-monitoring): per
micro-batch rows, rates, and duration breakdown, collectable as a
DataFrame or persisted to a TackleTable metrics sink.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

METRICS_SCHEMA = (
    "query_id string, run_id string, name string, batch_id long, "
    "event_timestamp string, num_input_rows long, input_rows_per_second double, "
    "processed_rows_per_second double, duration_ms map<string,long>, "
    "sources string, sink string"
)


class StreamMetricsCollector(StreamingQueryListener):
    """Collects query-progress events in memory; optionally mirrors them
    into a TackleTable for SQL-side analysis (the reference's
    JSON-files→table pipeline collapsed into one step)."""

    def __init__(self, table_path: str | None = None):
        self.events: list[dict] = []
        self.table_path = table_path
        self._seen: set[tuple] = set()  # (run_id, batch_id) dedupe

    # -- listener callbacks --------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        self.ingest_progress(json.loads(event.progress.json))

    def ingest_progress(self, p: dict) -> None:
        """Record one progress payload (the dict form of
        StreamingQueryProgress.json). The listener callback funnels here;
        callers can also feed ``query.recentProgress`` directly, which
        makes metrics capture usable in pull mode when no listener is
        attached (or when the async listener bus lags behind a
        short-lived availableNow query). Idempotent per (runId, batchId):
        pull-mode progress can be merged on top of whatever subset the
        async listener already delivered without double-counting."""
        key = (p.get("runId"), p.get("batchId"))
        if key in self._seen:
            return
        self._seen.add(key)
        self.events.append(
            {
                "query_id": p.get("id"),
                "run_id": p.get("runId"),
                "name": p.get("name"),
                "batch_id": p.get("batchId"),
                "event_timestamp": p.get("timestamp"),
                "num_input_rows": p.get("numInputRows", 0),
                "input_rows_per_second": float(p.get("inputRowsPerSecond", 0.0) or 0.0),
                "processed_rows_per_second": float(p.get("processedRowsPerSecond", 0.0) or 0.0),
                "duration_ms": {k: int(v) for k, v in (p.get("durationMs") or {}).items()},
                "sources": json.dumps(p.get("sources", [])),
                "sink": json.dumps(p.get("sink", {})),
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- analysis ------------------------------------------------------
    def to_df(self, spark: SparkSession) -> DataFrame:
        if not self.events:
            return spark.createDataFrame([], METRICS_SCHEMA)
        return spark.createDataFrame(self.events, METRICS_SCHEMA)

    def summary(self, spark: SparkSession) -> DataFrame:
        """Per-query rollup: batches, rows, mean rates, p95-ish max batch
        duration — the monitor notebook's headline numbers."""
        df = self.to_df(spark)
        return df.groupBy("name").agg(
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("num_input_rows").alias("total_rows"),
            F.round(F.avg("input_rows_per_second"), 2).alias("avg_input_rps"),
            F.round(F.avg("processed_rows_per_second"), 2).alias("avg_processed_rps"),
            F.max(F.element_at(F.col("duration_ms"), "triggerExecution")).alias("max_trigger_ms"),
        )

    def flush_to_table(self, spark: SparkSession) -> None:
        if self.table_path is None or not self.events:
            return
        from lakehouse_tacklebox_spark.tablestore import TackleTable

        df = self.to_df(spark)
        try:
            TackleTable(spark, self.table_path).append(df)
        except FileNotFoundError:
            TackleTable.create(spark, self.table_path, df)
        self.events.clear()

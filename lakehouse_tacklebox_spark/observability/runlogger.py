"""RunLogger: pipeline-run logging, watermarks, stale-run cleanup.

Re-expresses the reference's DeltaLogger (deltalogger.py) on TackleTable:

- a logger table with monotonically assigned run ids (the reference uses
  a Delta IDENTITY column, deltalogger.py:179-196; TackleTable has no
  identity columns, so ids are max+1 under the single-writer-per-pipeline
  assumption the reference itself documents),
- start/complete/fail lifecycle rows (deltalogger.py:343-442),
- stale-run cleanup: RUNNING rows older than a timeout are marked STALE
  (deltalogger.py:811-846),
- watermark getters for manual incremental batches: the high-watermark
  pattern of Step 6:208-243 and deltalogger.py:609-648 — filter source
  rows to ``ts > last successful watermark``, process, then record the
  new max ts with the run row.

Scale notes: the logger table is tiny (one row per run); every read is a
single-partition scan and updates rewrite one small file. The payoff is
on the *source* side: `incremental_frame` pushes ``ts > watermark`` into
the scan as a literal predicate, so a 100 TB time-partitioned source
prunes to the unprocessed suffix instead of full-scanning.
"""

from __future__ import annotations

import json
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_tacklebox_spark.tablestore.table import TackleTable

_SCHEMA = (
    "run_id BIGINT, pipeline STRING, status STRING, start_ts TIMESTAMP, "
    "end_ts TIMESTAMP, duration_s DOUBLE, processed_watermark TIMESTAMP, "
    "metadata STRING"
)

RUNNING, SUCCESS, FAILED, STALE = "RUNNING", "SUCCESS", "FAILED", "STALE"


def _now() -> datetime:
    return datetime.now(timezone.utc)


class RunLogger:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        try:
            self.table = TackleTable(spark, path)
        except Exception:
            empty = spark.createDataFrame([], _SCHEMA)
            self.table = TackleTable.create(spark, path, empty)

    # -- lifecycle ----------------------------------------------------------
    def start_run(self, pipeline: str, metadata: dict | None = None) -> int:
        df = self.table.read()
        max_id = df.agg(F.max("run_id")).collect()[0][0]
        run_id = (max_id or 0) + 1
        row = [(run_id, pipeline, RUNNING, _now(), None, None, None, json.dumps(metadata or {}))]
        self.table.append(self.spark.createDataFrame(row, _SCHEMA))
        return run_id

    def _finish(self, run_id: int, status: str, watermark: datetime | None, metadata: dict | None) -> None:
        end = _now().isoformat()
        sets = {
            "status": f"'{status}'",
            "end_ts": f"timestamp'{end}'",
            "duration_s": f"cast(unix_micros(timestamp'{end}') - unix_micros(start_ts) as double) / 1e6",
        }
        if watermark is not None:
            sets["processed_watermark"] = f"timestamp'{watermark.isoformat()}'"
        if metadata is not None:
            sets["metadata"] = "'" + json.dumps(metadata).replace("'", "''") + "'"
        self.table.update(f"run_id = {run_id}", sets)

    def complete_run(self, run_id: int, watermark: datetime | None = None, metadata: dict | None = None) -> None:
        self._finish(run_id, SUCCESS, watermark, metadata)

    def fail_run(self, run_id: int, error: str | None = None) -> None:
        self._finish(run_id, FAILED, None, {"error": (error or "")[:2000]})

    def cleanup_stale_runs(self, max_age_s: float = 86400.0) -> None:
        """Mark RUNNING rows whose start is older than the timeout as STALE
        (deltalogger.py:811-846 semantics)."""
        cutoff = time.time() - max_age_s
        self.table.update(
            f"status = '{RUNNING}' AND unix_micros(start_ts) / 1e6 < {cutoff}",
            {"status": f"'{STALE}'"},
        )

    # -- queries ------------------------------------------------------------
    def runs(self, pipeline: str | None = None) -> DataFrame:
        df = self.table.read()
        return df.filter(F.col("pipeline") == pipeline) if pipeline else df

    def most_recent_run(self, pipeline: str):
        rows = self.runs(pipeline).orderBy(F.desc("run_id")).limit(1).collect()
        return rows[0] if rows else None

    def last_successful_watermark(self, pipeline: str) -> datetime | None:
        """High watermark of the last SUCCESS run (deltalogger.py:609-648)."""
        rows = (
            self.runs(pipeline)
            .filter(F.col("status") == SUCCESS)
            .agg(F.max("processed_watermark").alias("wm"))
            .collect()
        )
        return rows[0].wm if rows and rows[0].wm else None

    # -- incremental-batch helper (Step 6:208-243) --------------------------
    def incremental_frame(self, source: DataFrame, ts_col: str, pipeline: str) -> DataFrame:
        """Rows of ``source`` newer than the pipeline's high watermark.

        The watermark is injected as a literal predicate so it reaches
        the scan (PushedFilters) — on a time-partitioned source this is
        partition pruning, not a post-scan filter.
        """
        wm = self.last_successful_watermark(pipeline)
        if wm is None:
            return source
        return source.filter(F.col(ts_col) > F.lit(wm))

    def run_incremental(self, source: DataFrame, ts_col: str, pipeline: str, process) -> int:
        """One watermarked incremental batch: filter > watermark, apply
        ``process(df)``, log SUCCESS with the new max ts (or FAILED)."""
        run_id = self.start_run(pipeline)
        try:
            batch = self.incremental_frame(source, ts_col, pipeline)
            new_wm = batch.agg(F.max(ts_col)).collect()[0][0]
            process(batch)
            old = self.last_successful_watermark(pipeline)
            self.complete_run(run_id, watermark=new_wm or old)
            return run_id
        except Exception as e:
            self.fail_run(run_id, str(e))
            raise

"""Query replay: re-run a logged workload with its original timing.

Re-expresses the DBSQL query replay tool (dbsql-query-replay-tool/
00-Functions.py): take a query history (query text + original start
time), normalize start times to offsets from the first query
(min().over(Window) baseline, 00-Functions.py:413-426), then re-submit
each query at its original inter-arrival offset from a thread pool
(sender threads, :44-45) and compare replay vs. original duration.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def with_offsets(history: DataFrame, start_col: str = "start_ts", group_col: str | None = None) -> DataFrame:
    """Add ``offset_s``: seconds from the workload's first query start
    (per group when ``group_col`` is given — the reference offsets per
    warehouse, 00-Functions.py:413-426)."""
    w = Window.partitionBy(group_col) if group_col else Window.partitionBy(F.lit(1))
    base = F.min(start_col).over(w)
    return history.withColumn(
        "offset_s",
        (F.unix_micros(F.col(start_col)) - F.unix_micros(base)) / 1e6,
    )


def replay_with_offsets(
    spark: SparkSession,
    history: DataFrame,
    query_col: str = "query_text",
    offset_col: str = "offset_s",
    duration_col: str | None = "duration_s",
    max_workers: int = 50,
    time_scale: float = 1.0,
) -> DataFrame:
    """Re-submit each query at its original offset (scaled by
    ``time_scale``; use <1 to compress long traces). Returns one row per
    query: replay duration vs. original, and the replay/original ratio.

    The trace is collected to the driver — a workload trace is tiny
    (one row per query, not per data row), so this is not a
    distributed-data collect.
    """
    cols = [query_col, offset_col] + ([duration_col] if duration_col else [])
    trace = [r.asDict() for r in history.select(*cols).orderBy(offset_col).collect()]
    t0 = time.perf_counter()

    def one(row: dict) -> tuple:
        target = row[offset_col] * time_scale
        delay = target - (time.perf_counter() - t0)
        if delay > 0:
            time.sleep(delay)
        start = time.perf_counter()
        try:
            spark.sql(row[query_col]).count()
            status, err = "SUCCESS", ""
        except Exception as e:  # noqa: BLE001
            status, err = "FAILED", str(e)[:500]
        dur = time.perf_counter() - start
        return (
            row[query_col],
            float(row[offset_col]),
            round(dur, 6),
            float(row[duration_col]) if duration_col else None,
            status,
            err,
        )

    with ThreadPoolExecutor(max_workers=max_workers, thread_name_prefix="replay") as pool:
        rows = list(pool.map(one, trace))
    out = spark.createDataFrame(
        rows,
        "query_text string, offset_s double, replay_duration_s double, "
        "original_duration_s double, status string, error string",
    )
    return out.withColumn(
        "speedup",
        F.when(
            F.col("replay_duration_s") > 0,
            F.round(F.col("original_duration_s") / F.col("replay_duration_s"), 4),
        ),
    )

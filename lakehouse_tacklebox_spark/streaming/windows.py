"""Event-time windowed aggregation for streams.

The reference's streaming is ingest-and-merge; its time-bucketing runs
in batch (hourly rollup + moving average, Step 4:8-67). SURVEY.md §2.9
notes the Spark-native expression of those rollups is event-time
windows + watermarks — this module provides them for both batch and
streaming DataFrames (the same code path works on either, which is how
Structured Streaming is meant to be used).

Scale notes: watermarking bounds state — without it a windowed agg on
an unbounded stream grows state forever; with it, windows older than
the watermark are finalized and evicted. Partial aggregation still
applies per micro-batch, so the shuffle carries (window, keys) partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    aggs: list,
    keys: list[str] | None = None,
    slide: str | None = None,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is given) event-time window
    aggregation; watermark applied only for streaming inputs.

    Output: (window_start, window_end, keys..., aggs...).
    """
    keys = keys or []
    if df.isStreaming and watermark:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration, slide) if slide else F.window(F.col(ts_col), window_duration)
    out = df.groupBy(win.alias("w"), *keys).agg(*aggs)
    agg_cols = [c for c in out.columns if c not in ("w", *keys)]
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *agg_cols,
    )


def sessionized_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Session-window aggregation (gap-based), the streaming-native form
    of the batch sessionize operator (queries/windows.py win_sessionize)."""
    if df.isStreaming and watermark:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *keys).agg(*aggs)
    agg_cols = [c for c in out.columns if c not in ("w", *keys)]
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *keys,
        *agg_cols,
    )

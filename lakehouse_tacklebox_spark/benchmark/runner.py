"""Concurrent benchmark runner: warm-up, repetitions, QPM.

Re-expresses the reference's TPC-DS Runner + async concurrency tester
(run_tpcds_benchmarking.py:86-135; 01-concurrency-testing-notebook.py:
100-170,364-404) for in-process Spark: the reference fires queries at a
remote warehouse over REST from N asyncio tasks; here N Python threads
submit jobs to one SparkSession — Spark's scheduler runs them
concurrently (FAIR pools when configured), which is the local analogue
of warehouse concurrency.

Protocol parity: result cache off (Spark has none), warm-up =
one un-timed execution per query (the reference pre-warms with
SELECT *, run_tpcds_benchmarking.py:106-109), `repetitions` timed runs,
QPM = queries/minute over makespan (README.md:48 metric).

Scale notes: only durations cross the driver (`df.count()` forces full
execution without materializing rows); per-thread stats go into one
small result DataFrame. At 1000-executor scale, raise concurrency and
set spark.scheduler.mode=FAIR so long queries don't starve short ones.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class BenchmarkResult:
    name: str
    repetition: int
    thread: str
    start_offset_s: float
    duration_s: float
    status: str
    error: str = ""


@dataclass
class BenchmarkRunner:
    spark: SparkSession
    queries: dict[str, Callable[[SparkSession], DataFrame]]
    concurrency: int = 4
    repetitions: int = 1
    warmup: bool = True
    results: list[BenchmarkResult] = field(default_factory=list)

    def _execute(self, name: str, fn, rep: int, t0: float) -> BenchmarkResult:
        start = time.perf_counter()
        try:
            fn(self.spark).count()
            status, err = "SUCCESS", ""
        except Exception as e:  # noqa: BLE001 — benchmark records failures
            status, err = "FAILED", str(e)[:500]
        return BenchmarkResult(
            name=name,
            repetition=rep,
            thread=threading.current_thread().name,
            start_offset_s=round(start - t0, 6),
            duration_s=round(time.perf_counter() - start, 6),
            status=status,
            error=err,
        )

    def run(self) -> "BenchmarkRunner":
        if self.warmup:
            for fn in self.queries.values():
                fn(self.spark).count()
        # One repetition wave at a time, clearing persisted intermediates
        # at the wave boundary: queries that persist (the dedup pipelines
        # cache their shingle frames) would otherwise stack CONCURRENCY ×
        # REPETITIONS cached copies into storage memory under the timed
        # runs and leave eviction timing to LRU. The barrier between waves
        # mirrors the reference's per-repetition loop; its cost is one
        # thread-join + a metadata-only clearCache per wave.
        t0 = time.perf_counter()
        self.results = []
        with ThreadPoolExecutor(max_workers=self.concurrency, thread_name_prefix="bench") as pool:
            for rep in range(self.repetitions):
                futures = [
                    pool.submit(self._execute, name, fn, rep, t0)
                    for name, fn in self.queries.items()
                ]
                self.results.extend(f.result() for f in futures)
                self.spark.catalog.clearCache()
        self.makespan_s = time.perf_counter() - t0
        return self

    # -- reporting ----------------------------------------------------------
    def results_df(self) -> DataFrame:
        rows = [
            (r.name, r.repetition, r.thread, r.start_offset_s, r.duration_s, r.status, r.error)
            for r in self.results
        ]
        return self.spark.createDataFrame(
            rows,
            "name string, repetition int, thread string, start_offset_s double, "
            "duration_s double, status string, error string",
        )

    def summary_df(self) -> DataFrame:
        """Per-query avg/stddev/min/max — the concurrency notebook's
        result aggregation (01-concurrency-testing-notebook.py:374-375)."""
        from pyspark.sql import functions as F

        return (
            self.results_df()
            .groupBy("name")
            .agg(
                F.count(F.lit(1)).alias("runs"),
                F.sum((F.col("status") == "FAILED").cast("int")).alias("failures"),
                F.round(F.avg("duration_s"), 4).alias("avg_s"),
                F.round(F.coalesce(F.stddev("duration_s"), F.lit(0.0)), 4).alias("stddev_s"),
                F.round(F.min("duration_s"), 4).alias("min_s"),
                F.round(F.max("duration_s"), 4).alias("max_s"),
            )
            .orderBy("name")
        )

    def qpm(self) -> float:
        """Queries per minute over the concurrent makespan (README.md:48)."""
        ok = sum(1 for r in self.results if r.status == "SUCCESS")
        return round(ok / (self.makespan_s / 60.0), 2) if self.makespan_s > 0 else 0.0

"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Protocol mirrors the reference's TPC-DS runner semantics
(run_tpcds_benchmarking.py: result cache off, warm-up pass, wall-clock
per query, queries-per-minute): one un-timed warm-up execution per query
(JVM/code-gen warm-up — Spark has no result cache to disable), then a
timed pass; prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from lakehouse_tacklebox_spark.queries import REGISTRY, bench_queries
from lakehouse_tacklebox_spark.session import get_spark


def run_query(spark, spec, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = spec.fn(spark, sf_dir)
    # count() forces full execution without driver-side row materialization
    df.count()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="bench")

    specs = dict(bench_queries())
    # warm-up pass (un-timed): plan compilation + JIT
    for spec in specs.values():
        spec.fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        timings[name] = round(run_query(spark, spec, sf_dir), 3)

    total = round(sum(timings.values()), 3)
    qpm = round(len(timings) / (total / 60.0), 2) if total > 0 else 0.0
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "qpm": qpm,
                "sf": sf,
                "n_queries": len(timings),
                "registered_queries": len(REGISTRY),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

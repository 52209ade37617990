"""One leg of the bench's sf1 scaling probe (VERDICT r13 item 8).

At sf0.1 nothing parallelizes — every r13 32-vs-8-core ratio was
0.54–1.05 because the cost there is driver-sequential job latency — so
parallel-scaling claims need evidence at sf1. bench.py runs THIS script
twice as subprocesses (once per core count, cold JVM each, identical
protocol: same entries, same order, min-of-2 ``count()`` reps with
``clearCache`` between) and reports lo/hi wall-clock ratios per entry.
Two separate processes because ``local[N]`` is fixed at session start;
both legs being cold-JVM keeps the comparison apples-to-apples.

Usage (normally invoked by bench.py, with SPARK_GRAFT_CPUS set per leg):
    python tools/sf1_scaling_probe.py <sf1_dir> <name> [name ...]

Prints one line: ``SCALING_JSON:{"cpus": N, "queries": {name: sec}}``.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from lakehouse_tacklebox_spark.queries import REGISTRY  # noqa: E402
from lakehouse_tacklebox_spark.session import get_spark  # noqa: E402

# per-leg budget: the probe is additive evidence, never allowed to sink
# the bench — entries past the budget are skipped (and reported absent)
BUDGET_S = float(os.environ.get("SPARK_GRAFT_SF1_SCALING_BUDGET_S", "240"))


def main() -> None:
    sf1_dir, names = sys.argv[1], sys.argv[2:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name=f"sf1_scaling_c{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    t_start = time.perf_counter()
    out: dict[str, float] = {}
    for n in names:
        if time.perf_counter() - t_start > BUDGET_S:
            break
        fn = REGISTRY[n].fn
        reps = []
        for r in range(2):
            spark.sparkContext.setJobDescription(f"sf1 scaling c{cpus} {n} rep{r}")
            t0 = time.perf_counter()
            fn(spark, sf1_dir).count()
            reps.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            if time.perf_counter() - t_start > BUDGET_S:
                break
        out[n] = round(min(reps), 3)
    print("SCALING_JSON:" + json.dumps({"cpus": cpus, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()

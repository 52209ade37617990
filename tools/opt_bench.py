"""Optimization-round harness: isolated per-query timing + formatted
plan capture.

Times the named headline queries with bench.py's session confs and
protocol (warm-up pass, then min-of-3 timed ``count()`` reps with
``clearCache`` between reps) in THIS process, and optionally writes
``df.explain("formatted")`` to ``plans/r13/<name>_<tag>.txt`` so
before/after plan claims in OPTIMIZATION_r13.md are checkable without
running Spark.

Usage:
    python tools/opt_bench.py <tag> <name> [name ...]   # time + plans
    python tools/opt_bench.py --plans-only <tag> <name> [name ...]
    python tools/opt_bench.py --time-only <tag> <name> [name ...]

``<tag>`` is usually ``before`` or ``after``. Prints one JSON line with
per-query seconds.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from lakehouse_tacklebox_spark.queries import REGISTRY  # noqa: E402
from lakehouse_tacklebox_spark.session import get_spark  # noqa: E402

PLANS_DIR = REPO / "plans" / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")


def capture_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    args = sys.argv[1:]
    plans = True
    timing = True
    if args and args[0] == "--plans-only":
        timing = False
        args = args[1:]
    elif args and args[0] == "--time-only":
        plans = False
        args = args[1:]
    tag, names = args[0], args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"opt_bench_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    PLANS_DIR.mkdir(parents=True, exist_ok=True)

    out: dict[str, float] = {}
    for n in names:
        fn = REGISTRY[n].fn
        spark.sparkContext.setJobDescription(f"{n} [{tag}] warmup")
        df = fn(spark, sf_dir)
        if plans:
            (PLANS_DIR / f"{n}_{tag}.txt").write_text(capture_plan(df))
        df.count()
        spark.catalog.clearCache()
        if not timing:
            continue
        reps = []
        for r in range(3):
            spark.sparkContext.setJobDescription(f"{n} [{tag}] rep{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            reps.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[n] = round(min(reps), 3)
        print(f"  {n}: {out[n]}s  (reps: {[round(x, 2) for x in reps]})", file=sys.stderr)
    print("OPT_BENCH_JSON:" + json.dumps({"tag": tag, "sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()

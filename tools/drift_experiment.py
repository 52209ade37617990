"""Controlled experiment for the compounding serial-bench drift
(VERDICT r7 item 2): the five worst r6→r7 movers are timed

  (a) ISOLATED — a fresh single-query session per query (subprocess,
      same get_spark confs, own warm-up, min-of-2), vs
  (b) IN-SESSION — inside a full bench-shaped session (warm-up pass over
      ALL headline specs, then the same sorted serial timed pass bench.py
      runs), vs
  (c) IN-SESSION + spark.sql.codegen.cache.maxEntries raised from the
      default 100 — the codegen-cache-pressure hypothesis: the generated
      classes of 76 headline plans (plus their warm-up variants) exceed
      100 entries, so by the time the timed pass reaches a query its
      code was evicted and the rep pays recompilation; raising the cache
      should close the isolated↔in-session gap if (and only if) that is
      the cause.

Run with no args from the repo root; writes DRIFT_EXPERIMENT.json and
prints a one-line verdict. Child modes (--one / --serial) exist so each
configuration gets its own JVM.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MOVERS = [
    "q8_market_share",
    "mm_audio_features",
    "knn_bruteforce",
    "profile_customer",
    "dedup_minhash_lsh",
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _specs():
    from lakehouse_tacklebox_spark.queries import REGISTRY

    return {
        name: spec
        for name, spec in REGISTRY.items()
        if "tpch" in spec.fn.__module__ or spec.bench
    }


def _get_spark(maxentries: int | None):
    from lakehouse_tacklebox_spark.session import get_spark

    extra = (
        {"spark.sql.codegen.cache.maxEntries": str(maxentries)}
        if maxentries
        else None
    )
    spark = get_spark(app_name="drift-exp", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _time(spark, fn) -> float:
    t0 = time.perf_counter()
    fn(spark, SF_DIR).count()
    return time.perf_counter() - t0


def child_one(name: str) -> None:
    """Fresh session, ONE query: warm-up + min-of-2."""
    spark = _get_spark(None)
    specs = _specs()
    fn = specs[name].fn
    fn(spark, SF_DIR).count()  # warm-up
    reps = []
    for _ in range(2):
        reps.append(_time(spark, fn))
        spark.catalog.clearCache()
    print(json.dumps({name: round(min(reps), 3)}))
    spark.stop()


def child_serial(maxentries: int | None) -> None:
    """Bench-shaped session: warm ALL headline specs, then the same
    sorted min-of-2 serial pass bench.py runs; report only the movers."""
    spark = _get_spark(maxentries)
    specs = _specs()
    for spec in specs.values():
        spec.fn(spark, SF_DIR).count()
    out = {}
    for name, spec in sorted(specs.items()):
        reps = []
        for _ in range(2):
            reps.append(_time(spark, spec.fn))
            spark.catalog.clearCache()
        if min(reps) < 1.0:
            reps.append(_time(spark, spec.fn))
            spark.catalog.clearCache()
        if name in MOVERS:
            out[name] = round(min(reps), 3)
    print(json.dumps(out))
    spark.stop()


def _run_child(args: list[str]) -> dict:
    r = subprocess.run(
        [sys.executable, __file__, *args],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    if r.returncode != 0:
        raise RuntimeError(f"child {args} failed: {r.stderr[-500:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    if "--one" in sys.argv:
        child_one(sys.argv[sys.argv.index("--one") + 1])
        return
    if "--serial" in sys.argv:
        me = None
        if "--maxentries" in sys.argv:
            me = int(sys.argv[sys.argv.index("--maxentries") + 1])
        child_serial(me)
        return

    isolated = {}
    for name in MOVERS:
        isolated.update(_run_child(["--one", name]))
        print(f"isolated {name}: {isolated[name]}s", file=sys.stderr)
    insession = _run_child(["--serial"])
    print(f"in-session: {insession}", file=sys.stderr)
    insession_bigcache = _run_child(["--serial", "--maxentries", "2000"])
    print(f"in-session maxEntries=2000: {insession_bigcache}", file=sys.stderr)

    gap = {n: round(insession[n] / isolated[n], 2) for n in MOVERS}
    gap_bigcache = {
        n: round(insession_bigcache[n] / isolated[n], 2) for n in MOVERS
    }
    payload = {
        "sf_dir": SF_DIR,
        "movers": MOVERS,
        "isolated_s": isolated,
        "insession_s": insession,
        "insession_codegen2000_s": insession_bigcache,
        "insession_over_isolated": gap,
        "codegen2000_over_isolated": gap_bigcache,
    }
    mean = lambda d: sum(d.values()) / len(d)  # noqa: E731
    if mean(gap) > 1.15 and mean(gap_bigcache) < mean(gap) - 0.1:
        payload["verdict"] = (
            "in-session pressure confirmed AND codegen-cache is the lever: "
            f"mean gap {mean(gap):.2f}x drops to {mean(gap_bigcache):.2f}x "
            "with spark.sql.codegen.cache.maxEntries=2000"
        )
    elif mean(gap) > 1.15:
        payload["verdict"] = (
            f"in-session pressure confirmed (mean gap {mean(gap):.2f}x) but "
            f"NOT codegen-cache: gap persists at {mean(gap_bigcache):.2f}x "
            "with a 2000-entry cache — cause is elsewhere in session state"
        )
    else:
        payload["verdict"] = (
            f"no in-session pressure (mean gap {mean(gap):.2f}x): the r6→r7 "
            "drift is not reproducible as registry/session pressure — "
            "round-over-round machine/load variance is the remaining suspect"
        )
    Path("DRIFT_EXPERIMENT.json").write_text(json.dumps(payload, indent=1) + "\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()

"""Drive the driver contract end-to-end like the verify harness would:
plain SparkSession (no engine confs), import __spark_entry__, smoke
entry(), then run EVERY queries() entry at sf0.01 and compare against
oracle_sql() via DuckDB."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession

# deliberately vanilla — simulates the driver's own session
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E
from oracle_check import compare

t0 = time.time()
df = E.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.columns}, {time.time()-t0:.1f}s")
assert len(rows) >= 0 and df.columns

qs = E.queries()
oracles = E.oracle_sql()
print(f"queries: {len(qs)} registered, {len(oracles)} with oracles")

import re as _re
import sys as _sys
SF = _sys.argv[1] if len(_sys.argv) > 1 else "/root/testdata/sf0.01"
# optional argv[2]: regex — run only matching query names (iteration aid;
# the pre-commit full run still uses no filter)
if len(_sys.argv) > 2:
    pat = _re.compile(_sys.argv[2])
    qs = {n: f for n, f in qs.items() if pat.search(n)}
# SPARK_GRAFT_DRIVE_JOBS > 1 runs entries through a thread pool (each
# compare() opens its own DuckDB connection; the battery is
# partition-invariant by design, so concurrent scheduling cannot change
# results — only wall-clock). Default 1 = the driver's serial protocol.
JOBS = int(os.environ.get("SPARK_GRAFT_DRIVE_JOBS", "1"))
fails = []


def _run_one(item):
    name, fn = item
    t0 = time.time()
    try:
        d = fn(spark, SF)
        if name in oracles:
            problems = compare(d, oracles[name], SF)
            return (name, problems, "OK " if not problems else "FAIL", time.time() - t0)
        n = d.count()
        return (name, [], f"OK(rows-only n={n})", time.time() - t0)
    except Exception as ex:  # noqa: BLE001 — recorded as a failure row
        return (name, [str(ex)[:200]], "ERR", time.time() - t0)


items = sorted(qs.items())
if JOBS > 1:
    from concurrent.futures import ThreadPoolExecutor, as_completed

    with ThreadPoolExecutor(max_workers=JOBS) as pool:
        futs = [pool.submit(_run_one, it) for it in items]
        for f in as_completed(futs):
            name, problems, status, dt = f.result()
            if problems:
                fails.append((name, problems))
            # Inline the first problem so a threaded ERR/FAIL is as
            # diagnosable live as the serial protocol's print.
            detail = f" — {problems[0]}" if problems else ""
            print(f"  {status} {name} {dt:.1f}s{detail}")
else:
    for it in items:
        name, problems, status, dt = _run_one(it)
        if problems:
            fails.append((name, problems))
        print(f"  {status} {name} {dt:.1f}s")

print()
if fails:
    for name, p in fails:
        print("FAIL", name, p[:2])
    sys.exit(1)
jobs_note = f" (jobs={JOBS})" if JOBS > 1 else ""
print(f"ALL {len(qs)} QUERIES PASS AT {SF.rstrip('/').split('/')[-1]} under a vanilla SparkSession{jobs_note}")

"""Drive the driver contract end-to-end like the verify harness would:
plain SparkSession (no engine confs), import __spark_entry__, smoke
entry(), then run EVERY queries() entry at sf0.01 and compare against
oracle_sql() via DuckDB."""

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
fails = []
for name, fn in sorted(qs.items()):
    t0 = time.time()
    try:
        d = fn(spark, SF)
        if name in oracles:
            problems = compare(d, oracles[name], SF)
            status = "OK " if not problems else "FAIL"
            if problems:
                fails.append((name, problems))
        else:
            n = d.count()
            status = f"OK(rows-only n={n})"
        print(f"  {status} {name} {time.time()-t0:.1f}s")
    except Exception as ex:
        fails.append((name, [str(ex)[:200]]))
        print(f"  ERR {name}: {str(ex)[:200]}")

print()
if fails:
    for name, p in fails:
        print("FAIL", name, p[:2])
    sys.exit(1)
print(f"ALL {len(qs)} QUERIES PASS AT {SF.rstrip('/').split('/')[-1]} under a vanilla SparkSession")

"""Dtype-level oracle parity: catch driver hash mismatches before the gate.

The driver's CORRECTNESS compare hashes *values* after materializing both
sides; any dtype skew between Spark and DuckDB (most commonly DuckDB's
sum(BIGINT) -> HUGEINT -> arrow decimal128 / pandas float64) changes the
hashed representation even when the numbers are equal. Round 2 lost five
green rows to exactly this.

This tool compares, for every registered oracled query:
  - the Spark result schema (no job runs; schema only), against
  - the DuckDB oracle's Arrow schema via `SELECT * FROM (<oracle>) LIMIT 0`.

Any column whose arrow type is outside the allowed family for its Spark
type is reported. Run it at sf0.001 (types don't depend on scale):

    python tools/dtype_parity.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb
import pyarrow as pa

# spark simpleString type -> acceptable arrow type predicate
_OK = {
    "bigint": lambda t: pa.types.is_integer(t),
    "int": lambda t: pa.types.is_integer(t),
    "smallint": lambda t: pa.types.is_integer(t),
    "tinyint": lambda t: pa.types.is_integer(t),
    "double": lambda t: pa.types.is_floating(t),
    "float": lambda t: pa.types.is_floating(t),
    "string": lambda t: pa.types.is_string(t) or pa.types.is_large_string(t),
    "boolean": lambda t: pa.types.is_boolean(t),
    "date": lambda t: pa.types.is_date(t),
    "timestamp": lambda t: pa.types.is_timestamp(t),
    "timestamp_ntz": lambda t: pa.types.is_timestamp(t),
    "binary": lambda t: pa.types.is_binary(t) or pa.types.is_large_binary(t),
}


def _spark_kind(dt) -> str:
    s = dt.simpleString()
    if s.startswith("decimal"):
        return "decimal"
    if s.startswith("array"):
        return "array"
    return s


def check_all(sf_dir: str) -> int:
    from lakehouse_tacklebox_spark.queries import REGISTRY
    from lakehouse_tacklebox_spark.session import get_spark
    from oracle_check import duck_connection

    spark = get_spark()
    con = duck_connection(sf_dir)
    n_bad = 0
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            sfields = {f.name: f.dataType for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001 - report, keep scanning
            print(f"[SPARK-ERR] {name}: {e}")
            n_bad += 1
            continue
        try:
            arrow = con.execute(f"SELECT * FROM ({spec.oracle}) LIMIT 0").arrow().schema
        except Exception as e:  # noqa: BLE001
            print(f"[DUCK-ERR] {name}: {e}")
            n_bad += 1
            continue
        dfields = {f.name: f.type for f in arrow}
        if set(sfields) != set(dfields):
            print(f"[COLS] {name}: spark={sorted(sfields)} duck={sorted(dfields)}")
            n_bad += 1
            continue
        for col, sdt in sfields.items():
            kind = _spark_kind(sdt)
            at = dfields[col]
            ok = _OK.get(kind)
            if kind == "decimal" or pa.types.is_decimal(at):
                # any decimal on either side materializes differently
                # (Decimal objects / decimal128) than the other side's
                # long/double -> driver hash risk. Require both decimal.
                if not (kind == "decimal" and pa.types.is_decimal(at)):
                    print(f"[DTYPE] {name}.{col}: spark={sdt.simpleString()} duck={at}")
                    n_bad += 1
                continue
            if kind == "array":
                if not (pa.types.is_list(at) or pa.types.is_large_list(at)):
                    print(f"[DTYPE] {name}.{col}: spark={sdt.simpleString()} duck={at}")
                    n_bad += 1
                continue
            if ok is None:
                print(f"[UNKNOWN] {name}.{col}: spark={sdt.simpleString()} duck={at}")
                n_bad += 1
            elif not ok(at):
                print(f"[DTYPE] {name}.{col}: spark={sdt.simpleString()} duck={at}")
                n_bad += 1
    con.close()
    return n_bad


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    bad = check_all(sf)
    print(f"dtype mismatches: {bad}")
    sys.exit(1 if bad else 0)

"""COPY INTO: idempotent incremental file ingest for TackleTable.

Re-expresses Delta's COPY INTO as the reference uses it
(Step 1:125-147, Step 12:100-118): load files from a source directory
into a table exactly once — re-running the command ingests only files
not already loaded — with PATTERN glob filtering, format options, and a
cast-projection transform (the reference's ``SELECT _c0::int ...``
subquery becomes a ``transform`` callable over the source DataFrame).

The loaded-file set lives in the table's own commit log (each COPY INTO
commit records its ``sourceFiles``), so idempotence survives restarts
and needs no side state — the same ledger COPY INTO keeps inside the
Delta log.

Scale notes: only *new* files are listed to Spark, so a daily ingest
over a directory with years of history reads one day of data; the
loaded-set is filenames only (KB per thousand files). File listing is
driver-side like the reference's — swap ``_list`` for a storage
inventory table when directories reach millions of objects.
"""

from __future__ import annotations

import fnmatch
import os

from pyspark.sql import DataFrame

from lakehouse_tacklebox_spark.tablestore.table import TackleTable, _write_files

OPERATION = "COPY INTO"


def _list(source_dir: str, pattern: str | None) -> list[str]:
    out = []
    for root, _, files in os.walk(source_dir):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            if pattern and not fnmatch.fnmatch(f, pattern):
                continue
            out.append(os.path.join(root, f))
    return sorted(out)


def loaded_files(table: TackleTable) -> set[str]:
    out: set[str] = set()
    for entry in table.history():
        if entry["operation"] == OPERATION:
            out.update(entry["operationParameters"].get("sourceFiles", []))
    return out


def copy_into(
    table: TackleTable,
    source_dir: str,
    file_format: str = "parquet",
    pattern: str | None = None,
    format_options: dict[str, str] | None = None,
    transform=None,
) -> dict:
    """Ingest not-yet-loaded files; returns {"numSourceFiles", "numLoadedFiles",
    "numOutputRows", "version"}. No-op (no new commit) when nothing is new."""
    all_files = _list(source_dir, pattern)
    new = [f for f in all_files if f not in loaded_files(table)]
    result = {"numSourceFiles": len(all_files), "numLoadedFiles": len(new)}
    if not new:
        result.update({"numOutputRows": 0, "version": table.version()})
        return result

    reader = table.spark.read.format(file_format)
    for k, v in (format_options or {}).items():
        reader = reader.option(k, v)
    df: DataFrame = reader.load(new)
    if transform is not None:
        df = transform(df)

    from lakehouse_tacklebox_spark.tablestore.table import _align_schema

    df = _align_schema(df, table._active_files()[1], allow_new=False)
    files, n = _write_files(df, table.path)
    version = table._commit(
        OPERATION,
        {"sourceFiles": new, "pattern": pattern or "", "format": file_format},
        files,
        [],
        {"numOutputRows": n, "numAddedFiles": len(files)},
    )
    result.update({"numOutputRows": n, "version": version})
    return result

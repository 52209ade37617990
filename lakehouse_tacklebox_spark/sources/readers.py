"""Batch file/external readers (SURVEY.md §2.1 S3-S6, S10, S15).

Thin, explicit wrappers over Spark's native readers so every scan keeps
Catalyst pushdown (PushedFilters/ReadSchema) — the wrappers add the
reference's ergonomics (header/multiline defaults, direct-path SQL,
pushdown-query JDBC), not an abstraction layer. Formats whose packages
aren't in this environment (XML via spark-xml) raise a clearly-marked
NotImplementedError at call time.

File export (S15, Parallel File Exports - Python Version.py): the
reference distributes storage-copy work by putting the *file list* in a
DataFrame and running a side-effecting UDF per row — copy throughput
scales with executors, not the driver. Ported with a local-filesystem
copy function; swap `_copy_one` for an object-store client on a real
cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_json(spark: SparkSession, path: str, multiline: bool = False, schema: str | None = None) -> DataFrame:
    """JSON scan, schema-on-read (stream-monitoring/01:36,197)."""
    reader = spark.read.option("multiline", str(multiline).lower())
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """ORC scan — Spark-native columnar alternative to parquet (same
    pushdown/pruning path; Hive-ecosystem interchange). Avro is the one
    interchange format NOT available here: it ships as an external
    module (spark-avro jar) absent from this environment — gate any
    avro path behind a format probe rather than assuming it."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "error") -> None:
    """ORC export with the same semantics as the parquet writers."""
    df.write.mode(mode).orc(path)


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    schema: str | None = None,
    infer: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with header (Step 1:333-350 FILEFORMAT = CSV)."""
    reader = spark.read.option("header", str(header).lower())
    if schema:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_direct_path(spark: SparkSession, file_format: str, path: str) -> DataFrame:
    """Direct-path SQL scan: SELECT * FROM format.`/path`
    (01.5-Delta-pipeline-spark-churn.py raw-data review; dlt-loans/03:53)."""
    return spark.sql(f"SELECT * FROM {file_format}.`{path}`")


def read_xml(spark: SparkSession, path: str, row_tag: str) -> DataFrame:
    """XML scan (llm-dolly-chatbot/02-Data-preparation.py:113 uses the
    spark-xml package; Spark 4 ships the XML source natively)."""
    return spark.read.format("xml").option("rowTag", row_tag).load(path)


def read_jdbc(spark: SparkSession, url: str, query: str, **options: str) -> DataFrame:
    """JDBC scan with full query pushdown (redshiftchecker.py:83-95:
    the WHERE/grain predicate runs in the remote DWH, only the result
    crosses the wire)."""
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


# -- distributed file export (S15) ------------------------------------------


def list_files_df(spark: SparkSession, directory: str, recursive: bool = True) -> DataFrame:
    """Directory listing as a DataFrame (the reference builds it from
    dbutils.fs.ls): (path, name, size_bytes). Hidden/underscore files are
    kept — filter with the same `~startswith('_')` predicate the
    reference uses."""
    rows = []
    if recursive:
        for root, _, files in os.walk(directory):
            for f in files:
                p = os.path.join(root, f)
                rows.append((p, f, os.path.getsize(p)))
    else:
        for f in os.listdir(directory):
            p = os.path.join(directory, f)
            if os.path.isfile(p):
                rows.append((p, f, os.path.getsize(p)))
    return spark.createDataFrame(rows, "path string, name string, size_bytes bigint")


def export_files(files_df: DataFrame, dest_dir: str, partitions: int | None = None) -> DataFrame:
    """Copy every listed file to ``dest_dir`` from executor tasks via a
    side-effecting UDF (mv_s3_object pattern). Returns per-file status
    rows; repartition first so copy work spreads across the cluster."""

    def _copy_one(path: str, name: str) -> str:
        import shutil

        try:
            os.makedirs(dest_dir, exist_ok=True)
            shutil.copyfile(path, os.path.join(dest_dir, name))
            return "OK"
        except Exception as e:  # noqa: BLE001 — per-file status, not abort
            return f"ERR: {e}"[:200]

    copy_udf = F.udf(_copy_one, "string")
    df = files_df
    if partitions:
        df = df.repartition(partitions)
    return df.withColumn("status", copy_udf("path", "name"))

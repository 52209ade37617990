"""REST-API sources → DataFrame (SURVEY.md §2.1 S11) and the SQL client
facade (§3.3 ServerlessClient surface).

The reference materializes remote API results three ways
(dbsqlclient.py): inline JSON row sets with manifest-driven casts
(:134-183), paged JSON endpoints re-queried until exhausted
(deltaoptimizer.py:858-945, queries_api.py), and chunked Arrow streams
(:328-404, ``pyarrow.ipc.open_stream`` → ``concat_tables`` → pandas).
Those shapes are ported here against any callable page-fetcher, so no
HTTP client is baked in (inject requests/urllib at the edge; none is
needed for tests).

The ServerlessClient exists only because DBSQL is remote; in-process
the same API collapses to ``spark.sql`` — ``LocalSQLClient`` keeps the
method surface (sql / sql_no_results / submit_multiple_sql_commands) so
reference callers port unchanged (SURVEY.md §3.2 note).

Scale notes: REST payloads are driver-side by nature; the conversion to
DataFrame is one createDataFrame per batch of pages. For large result
sets prefer the Arrow path — zero-copy column batches instead of
per-row dict parsing.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession


def dataframe_from_records(spark: SparkSession, records: list[dict], schema: str | None = None) -> DataFrame:
    """Inline JSON row set → DataFrame (dbsqlclient.py:134-183). With a
    schema the casts come from the manifest, like the reference's
    cast-expression projection."""
    if schema:
        return spark.createDataFrame(records, schema)
    if not records:
        raise ValueError("empty record set needs an explicit schema")
    return spark.createDataFrame(records)


def dataframe_from_pages(
    spark: SparkSession,
    fetch_page: Callable[[str | None], tuple[list[dict], str | None]],
    schema: str | None = None,
    max_pages: int = 10_000,
) -> DataFrame:
    """Paged JSON endpoint → DataFrame: call ``fetch_page(token)`` until
    it returns no next token (deltaoptimizer.py:874-929 loop)."""
    records: list[dict] = []
    token: str | None = None
    for _ in range(max_pages):
        page, token = fetch_page(token)
        records.extend(page)
        if token is None:
            break
    else:
        raise RuntimeError(f"pagination did not terminate within {max_pages} pages")
    return dataframe_from_records(spark, records, schema)


def dataframe_from_arrow_chunks(spark: SparkSession, chunks: Iterable[bytes]) -> DataFrame:
    """Chunked Arrow IPC streams → DataFrame (dbsqlclient.py:328-404):
    open each chunk, concat the tables, hand pandas to createDataFrame
    (Arrow-accelerated when spark.sql.execution.arrow is on)."""
    import pyarrow as pa
    import pyarrow.ipc

    tables = [pyarrow.ipc.open_stream(c).read_all() for c in chunks]
    if not tables:
        raise ValueError("no arrow chunks")
    merged = pa.concat_tables(tables)
    return spark.createDataFrame(merged.to_pandas())


class LocalSQLClient:
    """spark.sql-compatible facade with the ServerlessClient method
    surface (dbsqlclient.py:549-707)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def sql(self, sql_statement: str) -> DataFrame:
        return self.spark.sql(sql_statement)

    def sql_no_results(self, sql_statement: str) -> None:
        self.spark.sql(sql_statement).collect()

    def submit_multiple_sql_commands(self, sql_chain: str) -> list[dict]:
        """Run a ';'-separated chain; per-statement status list, like the
        reference's multi-statement tracker (dbsqlclient.py:593-707)."""
        from lakehouse_tacklebox_spark.tablestore.transactions import split_statements

        statuses = []
        for i, stmt in enumerate(split_statements(sql_chain)):
            try:
                self.spark.sql(stmt).collect()
                statuses.append({"index": i, "statement": stmt, "status": "SUCCEEDED", "error": ""})
            except Exception as e:  # noqa: BLE001 — per-statement status
                statuses.append({"index": i, "statement": stmt, "status": "FAILED", "error": str(e)[:300]})
                break
        return statuses

    def submit_multiple_sql_commands_last_results(self, sql_chain: str) -> DataFrame | None:
        """Chain variant returning the last statement's result
        (dbsqlclient.py 'last result' mode)."""
        from lakehouse_tacklebox_spark.tablestore.transactions import split_statements

        last = None
        for stmt in split_statements(sql_chain):
            last = self.spark.sql(stmt)
            last.collect()
        return last

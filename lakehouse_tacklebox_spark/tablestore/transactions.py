"""Multi-statement transactions with snapshot/rollback over TackleTable.

Re-expresses the reference's Transaction manager (transactions.py:304-541:
snapshot each to-be-altered table's version before executing, run the
statement chain, RESTORE-or-DROP on failure) and its AlteredTableParser
(transactions.py:39-291) for the TackleTable store. The reference leans
on sqlglot + Delta RESTORE; this environment has neither Delta nor
sqlglot, so the statement parser is a purpose-built tokenizer for the
DML grammar we dispatch (INSERT/UPDATE/DELETE/MERGE/CREATE/DROP/
TRUNCATE/RESTORE), and rollback replays TackleTable's own commit log.

Also ports the retry-with-backoff executor (deltahelpers.py:137-172) and
the temp-table manager (deltahelpers.py:13-82: materialize a DataFrame
to storage and read it back, so downstream plans scan a real table
instead of recomputing a long lineage — the Spark analogue is breaking
lineage before reuse, which matters when the same intermediate feeds
several outputs of a 100 TB job).

Concurrency: rollback is per-table RESTORE, not a global lock — same as
the reference ("one writer per table" guidance, transactions.py:21);
racing writers surface as CommitConflictError from the commit protocol.
"""

from __future__ import annotations

import re
import shutil
import tempfile
import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from lakehouse_tacklebox_spark.tablestore.table import CommitConflictError, TackleTable

Statement = str | Callable[[SparkSession], None]

_IDENT = r"[A-Za-z_][A-Za-z0-9_.]*"

# Statement-kind → (compiled pattern, altered-table group or None).
# Mirrors the reference's find_all(exp.Create|Merge|Insert|Delete|Drop|
# Update) altered-table inference (transactions.py:96-149).
_PATTERNS: list[tuple[str, re.Pattern, bool]] = [
    ("insert", re.compile(rf"^\s*INSERT\s+INTO\s+({_IDENT})\s+(.*)$", re.I | re.S), True),
    ("update", re.compile(rf"^\s*UPDATE\s+({_IDENT})\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$", re.I | re.S), True),
    ("delete", re.compile(rf"^\s*DELETE\s+FROM\s+({_IDENT})(?:\s+WHERE\s+(.*))?$", re.I | re.S), True),
    ("merge", re.compile(rf"^\s*MERGE\s+INTO\s+({_IDENT})\s+(?:AS\s+)?(\w+)?\s*USING\s+(.*)$", re.I | re.S), True),
    ("create", re.compile(rf"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?TABLE\s+({_IDENT})\s+AS\s+(.*)$", re.I | re.S), True),
    ("truncate", re.compile(rf"^\s*TRUNCATE\s+TABLE\s+({_IDENT})\s*$", re.I), True),
    ("drop", re.compile(rf"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?({_IDENT})\s*$", re.I), True),
    ("restore", re.compile(rf"^\s*RESTORE\s+TABLE\s+({_IDENT})\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*$", re.I), True),
    ("select", re.compile(r"^\s*(SELECT|WITH)\b.*$", re.I | re.S), False),
]

_MERGE_BODY = re.compile(
    r"^(?P<source>.+?)\s+(?:AS\s+)?(?P<salias>\w+)?\s*ON\s+(?P<on>.+?)\s+(?P<whens>WHEN\s+.*)$",
    re.I | re.S,
)
_WHEN = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED\s*(?:AND\s+(?P<cond>.*?))?\s*THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+\*|INSERT\s+\*|DELETE)",
    re.I | re.S,
)


def split_statements(sql: str) -> list[str]:
    """Split a multi-statement SQL string on ';' outside quotes
    (transactions.py:495-499 splits naively; we respect string literals).
    """
    out, buf, quote = [], [], None
    for ch in sql:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == ";":
            s = "".join(buf).strip()
            if s:
                out.append(s)
            buf = []
        else:
            buf.append(ch)
    s = "".join(buf).strip()
    if s:
        out.append(s)
    return out


_USE = re.compile(rf"^\s*USE\s+(?:DATABASE\s+|SCHEMA\s+)?({_IDENT})\s*$", re.I)
_COPY_INTO = re.compile(rf"^\s*COPY\s+INTO\s+({_IDENT})\b", re.I)


def _cte_tail(stmt: str) -> str:
    """For ``WITH a AS (...), b (cols) AS (...) <TAIL>`` return <TAIL>
    (the statement the CTE prelude feeds — possibly DML). Tracks quotes
    and balanced parens, so nested subqueries and string literals inside
    CTE bodies don't fool it; malformed input returns the statement
    unchanged (treated as non-altering, the reference's sqlglot
    fallback behavior)."""
    m = re.match(r"\s*WITH\s(?:\s*RECURSIVE\s)?", stmt, re.I)
    if not m:
        return stmt
    s, n, i = stmt, len(stmt), m.end()

    def consume_group(j: int) -> int:
        """From an opening '(' at/after j, return index past its match."""
        while j < n and s[j] != "(":
            j += 1
        if j >= n:
            return -1
        depth, quote = 0, None
        while j < n:
            ch = s[j]
            if quote:
                if ch == quote:
                    quote = None
            elif ch in ("'", '"'):
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return j + 1
            j += 1
        return -1

    while True:
        i = consume_group(i)  # column list OR body of this CTE
        if i < 0:
            return stmt
        k = i
        while k < n and s[k].isspace():
            k += 1
        if k < n and s[k] == ",":
            i = k + 1
            continue
        if re.match(r"AS\s*\(", s[k:], re.I):  # that group was a column list
            i = consume_group(k)
            if i < 0:
                return stmt
            k = i
            while k < n and s[k].isspace():
                k += 1
            if k < n and s[k] == ",":
                i = k + 1
                continue
        return s[k:]


def parse_altered_tables(
    statements: list[str], default_db: str | None = None
) -> list[str]:
    """Infer which tables a statement chain writes
    (AlteredTableParser.parse_sql_chain_for_altered_tables semantics,
    transactions.py:198-291). Handles DML behind a CTE prelude
    (``WITH ... INSERT INTO t``), COPY INTO (which the reference scrubs
    before sqlglot, transactions.py:155-189), and ``USE db`` scoping:
    unqualified names after a USE are reported as ``db.name``."""
    altered: list[str] = []
    current_db = default_db

    def record(name: str) -> None:
        if current_db and "." not in name:
            name = f"{current_db}.{name}"
        if name not in altered:
            altered.append(name)

    for stmt in statements:
        if not isinstance(stmt, str):
            continue
        um = _USE.match(stmt)
        if um:
            current_db = um.group(1)
            continue
        cm = _COPY_INTO.match(stmt)
        if cm:
            record(cm.group(1))
            continue
        body = _cte_tail(stmt)
        for _, pat, alters in _PATTERNS:
            m = pat.match(body)
            if m:
                if alters:
                    record(m.group(1))
                break
    return altered


@dataclass
class _Snapshot:
    name: str
    version: int  # -1 ⇒ table did not exist (DROP on rollback)


class TackleCatalog:
    """Name → TackleTable registry with temp-view refresh for SQL reads."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self.tables: dict[str, TackleTable] = {}

    def path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def create(self, name: str, df: DataFrame) -> TackleTable:
        t = TackleTable.create(self.spark, self.path(name), df)
        self.tables[name] = t
        return t

    def attach(self, name: str) -> TackleTable:
        t = TackleTable(self.spark, self.path(name))
        self.tables[name] = t
        return t

    def drop(self, name: str) -> None:
        self.tables.pop(name, None)
        shutil.rmtree(self.path(name).removeprefix("file:"), ignore_errors=True)

    def refresh_views(self) -> None:
        for name, t in self.tables.items():
            t.read().createOrReplaceTempView(name)

    def list_tables_df(self, include: list[str] | None = None, exclude: list[str] | None = None) -> DataFrame:
        """SHOW TABLES-style listing with include/exclude glob filters
        (deltaoptimizer.py:354-442 database/table include-exclude
        semantics): one row per table with DESCRIBE DETAIL fields."""
        import fnmatch

        def keep(name: str) -> bool:
            if include and not any(fnmatch.fnmatch(name, p) for p in include):
                return False
            if exclude and any(fnmatch.fnmatch(name, p) for p in exclude):
                return False
            return True

        rows = []
        for name in sorted(self.tables):
            if not keep(name):
                continue
            d = self.tables[name].detail()
            rows.append((name, d["location"], d["version"], d["numFiles"], d["sizeInBytes"]))
        return self.spark.createDataFrame(
            rows, "table string, location string, version int, num_files int, size_bytes bigint"
        )


class TransactionManager:
    """Execute a statement chain; on any failure, restore every altered
    table to its pre-transaction version (transactions.py:420-449:
    RESTORE if it existed, DROP if the transaction created it)."""

    def __init__(self, catalog: TackleCatalog):
        self.catalog = catalog
        self.spark = catalog.spark

    # -- snapshot / rollback ------------------------------------------------
    def _snapshot(self, names: list[str]) -> list[_Snapshot]:
        snaps = []
        for n in names:
            t = self.catalog.tables.get(n)
            snaps.append(_Snapshot(n, t.version() if t else -1))
        return snaps

    def _rollback(self, snaps: list[_Snapshot]) -> None:
        for s in snaps:
            if s.version < 0:
                self.catalog.drop(s.name)
            else:
                t = self.catalog.tables[s.name]
                if t.version() != s.version:
                    t.restore(s.version)

    # -- statement dispatch -------------------------------------------------
    def _dispatch(self, stmt: str) -> DataFrame | None:
        self.catalog.refresh_views()
        for kind, pat, _ in _PATTERNS:
            m = pat.match(stmt)
            if not m:
                continue
            if kind == "select":
                return self.spark.sql(stmt)
            if kind == "insert":
                self.catalog.tables[m.group(1)].append(self.spark.sql(m.group(2)))
            elif kind == "update":
                self.catalog.tables[m.group(1)].update(
                    m.group(3) or "true",
                    dict(_parse_assignments(m.group(2))),
                )
            elif kind == "delete":
                self.catalog.tables[m.group(1)].delete(m.group(2) or "true")
            elif kind == "merge":
                self._merge(m.group(1), m.group(3))
            elif kind == "create":
                name = m.group(1)
                df = self.spark.sql(m.group(2))
                if name in self.catalog.tables:
                    self.catalog.tables[name].overwrite(df)
                else:
                    self.catalog.create(name, df)
            elif kind == "truncate":
                t = self.catalog.tables[m.group(1)]
                t.delete("true")
            elif kind == "drop":
                self.catalog.drop(m.group(1))
            elif kind == "restore":
                self.catalog.tables[m.group(1)].restore(int(m.group(2)))
            return None
        raise ValueError(f"unsupported statement: {stmt[:120]!r}")

    def _merge(self, target: str, body: str) -> None:
        m = _MERGE_BODY.match(body.strip())
        if not m:
            raise ValueError(f"unsupported MERGE syntax: {body[:120]!r}")
        src_sql = m.group("source").strip()
        source = self.spark.sql(src_sql[1:-1] if src_sql.startswith("(") else f"SELECT * FROM {src_sql}")
        # equality conjuncts t.k = s.k → join keys
        keys = [k for k, _ in re.findall(rf"\b\w+\.(\w+)\s*=\s*(\w+)\.\w+", m.group("on"))]
        if not keys:
            raise ValueError(f"MERGE ON must contain equality conjuncts: {m.group('on')!r}")
        builder = self.catalog.tables[target].merge(source, on=keys)
        for w in _WHEN.finditer(m.group("whens")):
            action = re.sub(r"\s+", " ", w.group("action")).upper()
            cond = w.group("cond")
            if w.group("not"):
                builder = builder.whenNotMatchedInsertAll()
            elif action == "DELETE":
                builder = builder.whenMatchedDelete(cond)
            else:
                builder = builder.whenMatchedUpdateAll(cond)
        builder.execute()

    # -- public API ---------------------------------------------------------
    def execute_transaction(
        self,
        statements: list[Statement] | str,
        tables: list[str] | None = None,
    ) -> DataFrame | None:
        """Run statements atomically w.r.t. the catalog's tables.

        ``tables=None`` infers altered tables from the SQL chain
        (mode "inferred_altered_tables"); pass an explicit list to
        mirror the reference's "selected_tables" mode
        (transactions.py:452-485). Returns the last SELECT's DataFrame,
        if any.
        """
        if isinstance(statements, str):
            statements = split_statements(statements)
        sql_stmts = [s for s in statements if isinstance(s, str)]
        altered = tables if tables is not None else parse_altered_tables(sql_stmts)
        snaps = self._snapshot(altered)
        last: DataFrame | None = None
        try:
            for stmt in statements:
                if callable(stmt):
                    stmt(self.spark)
                else:
                    out = self._dispatch(stmt)
                    if out is not None:
                        last = out
            return last
        except Exception:
            self._rollback(snaps)
            raise


def _parse_assignments(s: str) -> list[tuple[str, str]]:
    """Split 'a = expr, b = expr' on top-level commas."""
    parts, buf, depth, quote = [], [], 0, None
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    out = []
    for p in parts:
        k, _, v = p.partition("=")
        out.append((k.strip(), v.strip()))
    return out


def retry_with_backoff(fn: Callable[[], object], max_retries: int = 5, base_s: float = 0.2):
    """Exponential-backoff retry for concurrent-writer conflicts
    (deltahelpers.py:137-172: 2**n backoff)."""
    for attempt in range(max_retries + 1):
        try:
            return fn()
        except CommitConflictError:
            if attempt == max_retries:
                raise
            time.sleep(base_s * (2**attempt))


class TempTableManager:
    """Materialize DataFrames to parquet temp tables and read them back
    (deltahelpers.py:43-55 createOrReplaceTempTable): breaks lineage so
    a reused intermediate is scanned, not recomputed.
    """

    def __init__(self, spark: SparkSession, root: str | None = None):
        self.spark = spark
        self.root = root or tempfile.mkdtemp(prefix="tackle_tmp_")
        self._names: set[str] = set()

    def create_or_replace(self, name: str, df: DataFrame) -> DataFrame:
        path = f"{self.root}/{name}"
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        out.createOrReplaceTempView(name)
        self._names.add(name)
        return out

    def remove_all(self) -> None:
        for name in self._names:
            self.spark.catalog.dropTempView(name)
            shutil.rmtree(f"{self.root}/{name}", ignore_errors=True)
        self._names.clear()

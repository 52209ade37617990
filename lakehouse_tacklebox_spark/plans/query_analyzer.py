"""Query-text analyzer: which tables/columns does a SQL query read,
filter, join, and group on?

The reference wraps ``sql_metadata.Parser`` in row UDFs to mine its
query-history log (deltaoptimizer.py:531-665, F1 in SURVEY.md §2.10).
sqlglot/sql_metadata aren't in this environment, so this is a
purpose-built lexer for the SELECT dialect our engine emits: FROM/JOIN
table refs with aliases, WHERE/ON/USING/GROUP BY column refs. It is
deliberately approximate in the same way the reference is (regex-grade,
no full grammar) — the optimizer consumes *usage counts*, so occasional
misses shift scores, not correctness.

Exposed both as plain Python (driver-side, for small query logs) and as
``@F.udf`` factories (executor-side, for profiling millions of logged
queries distributed — the reference's shape at deltaoptimizer.py:1089).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

_KW_STOP = r"WHERE|GROUP|ORDER|HAVING|LIMIT|UNION|JOIN|LEFT|RIGHT|FULL|INNER|CROSS|ON|USING"
_TABLE_RE = re.compile(rf"\b(?:FROM|JOIN)\s+([A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?(?!({_KW_STOP})\b)([A-Za-z_]\w*))?", re.I)
_WHERE_RE = re.compile(r"\bWHERE\b(.*?)(?:\bGROUP\s+BY\b|\bORDER\s+BY\b|\bHAVING\b|\bLIMIT\b|$)", re.I | re.S)
_ON_RE = re.compile(r"\bON\b(.*?)(?:\bWHERE\b|\bJOIN\b|\bLEFT\b|\bRIGHT\b|\bFULL\b|\bINNER\b|\bCROSS\b|\bGROUP\s+BY\b|\bORDER\s+BY\b|\bLIMIT\b|$)", re.I | re.S)
_USING_RE = re.compile(r"\bUSING\s*\(([^)]*)\)", re.I)
_GROUP_RE = re.compile(r"\bGROUP\s+BY\b(.*?)(?:\bORDER\s+BY\b|\bHAVING\b|\bLIMIT\b|$)", re.I | re.S)
_IDENT_RE = re.compile(r"\b(?:([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)\b")
_SQL_KEYWORDS = {
    "and", "or", "not", "in", "is", "null", "like", "between", "case", "when",
    "then", "else", "end", "cast", "as", "true", "false", "exists", "select",
    "from", "where", "interval", "date", "timestamp", "by", "group", "order",
    "distinct", "asc", "desc", "on", "using", "join", "inner", "left", "right",
    "full", "outer", "cross", "having", "limit", "count", "sum", "avg", "min",
    "max", "coalesce", "round", "abs", "substr", "substring", "concat", "lower",
    "upper", "trim", "year", "month", "day", "extract", "date_trunc",
}


def _idents(fragment: str) -> list[str]:
    """Column identifiers in an expression fragment (qualifier stripped),
    minus keywords/functions and string literals."""
    fragment = re.sub(r"'[^']*'", "", fragment)
    out = []
    for qual, name in _IDENT_RE.findall(fragment):
        if name.lower() in _SQL_KEYWORDS or (not qual and name.isdigit()):
            continue
        if name not in out:
            out.append(name)
    return out


def extract_tables(sql: str) -> list[str]:
    """Base tables referenced in FROM/JOIN (subquery parens excluded)."""
    out = []
    for m in _TABLE_RE.finditer(sql):
        t = m.group(1)
        if t and t.lower() not in ("select",) and t not in out:
            out.append(t)
    return out


def extract_filter_columns(sql: str) -> list[str]:
    return _idents(" ".join(m.group(1) for m in _WHERE_RE.finditer(sql)))


def extract_join_columns(sql: str) -> list[str]:
    frags = [m.group(1) for m in _ON_RE.finditer(sql)] + [m.group(1) for m in _USING_RE.finditer(sql)]
    return _idents(" ".join(frags))


def extract_group_columns(sql: str) -> list[str]:
    cols = []
    for m in _GROUP_RE.finditer(sql):
        for c in _idents(m.group(1)):
            if c not in cols:
                cols.append(c)
    return cols


def extract_query_profile(sql: str) -> dict[str, list[str]]:
    """All four extractions at once (the shape the optimizer joins on)."""
    return {
        "tables": extract_tables(sql),
        "filter_columns": extract_filter_columns(sql),
        "join_columns": extract_join_columns(sql),
        "group_columns": extract_group_columns(sql),
    }


# Executor-side variants for distributed query-log profiling
# (deltaoptimizer.py:531-591 registers the same shape as UDFs). Lazy:
# creating a UDF parses the return-type DDL, which needs a live session.
def udf_tables(col):
    return F.udf(extract_tables, "array<string>")(col)


def udf_filter_columns(col):
    return F.udf(extract_filter_columns, "array<string>")(col)


def udf_join_columns(col):
    return F.udf(extract_join_columns, "array<string>")(col)


def udf_group_columns(col):
    return F.udf(extract_group_columns, "array<string>")(col)

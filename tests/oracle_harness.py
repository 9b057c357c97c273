"""Local replica of the driver's DuckDB-oracle comparison (SURVEY.md §5.2).

Runs a declared Spark query and its oracle SQL side by side on the same
parquet fixtures and compares row count, schema (names), and an
order-insensitive value representation. Used by tests to catch oracle drift
before the driver does.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from sdlt_spark import tables


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in tables.TABLE_NAMES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return con


def _norm_cell(v: Any) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\0NaN"
        # 12 significant digits absorbs float noise the query didn't round away
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _normalize(rows: list[tuple], cols: list[str]) -> tuple[list[str], list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    return sorted_cols, out


# spark simpleString -> acceptable duckdb type names (lowered)
_TYPE_EQUIV = {
    "bigint": {"bigint"},
    "int": {"integer"},
    "smallint": {"smallint"},
    "double": {"double"},
    "float": {"float", "real"},
    "string": {"varchar"},
    "boolean": {"boolean"},
    "date": {"date"},
    "timestamp": {"timestamp"},
}


def compare(spark, sf_dir: str, name: str, fn, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_types = dict(sdf.dtypes)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_types = {c: str(t).lower() for c, t in zip(rel.columns, rel.types)}
    d_rows = rel.fetchall()
    con.close()

    problems: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"{name}: columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    for c in s_cols:
        ok = _TYPE_EQUIV.get(s_types[c])
        if ok is not None and d_types[c] not in ok:
            problems.append(
                f"{name}: type mismatch on {c}: spark={s_types[c]} duckdb={d_types[c]}"
            )
    if len(s_rows) != len(d_rows):
        problems.append(f"{name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
    _, s_norm = _normalize(s_rows, s_cols)
    _, d_norm = _normalize(d_rows, d_cols)
    if s_norm != d_norm:
        diff_s = [r for r in s_norm if r not in set(d_norm)][:3]
        diff_d = [r for r in d_norm if r not in set(s_norm)][:3]
        problems.append(f"{name}: values differ; spark-only={diff_s} duckdb-only={diff_d}")
    return problems

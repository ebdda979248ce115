"""Local stand-in for the driver's DuckDB-differential check.

Runs each __spark_entry__.queries() entry and its oracle_sql() twin on
the same sf dir, then compares row count + sorted column names + an
order-insensitive multiset of canonicalized values. Stricter than the
driver's hash (we compare actual values), so passing here should imply
passing there.
"""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


def compare_query(spark, con, name: str, fn, sql: str | None, sf_dir: str):
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    result = {"name": name, "spark_rows": len(s_rows)}
    if sql is None:
        result["mode"] = "rows_only"
        result["ok"] = True
        return result
    cur = con.execute(sql)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()
    result["mode"] = "oracle"
    result["oracle_rows"] = len(d_rows)
    cols_ok = sorted(s_cols) == sorted(d_cols)
    rows_ok = len(s_rows) == len(d_rows)
    vals_ok = False
    if cols_ok and rows_ok:
        vals_ok = canon_rows(s_cols, s_rows) == canon_rows(d_cols, d_rows)
    result["cols_ok"] = cols_ok
    result["rows_ok"] = rows_ok
    result["vals_ok"] = vals_ok
    result["ok"] = cols_ok and rows_ok and vals_ok
    if not cols_ok:
        result["spark_cols"] = s_cols
        result["oracle_cols"] = d_cols
    if cols_ok and rows_ok and not vals_ok:
        a = canon_rows(s_cols, s_rows)
        b = canon_rows(d_cols, d_rows)
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        result["first_diffs"] = diffs
    return result

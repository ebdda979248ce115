"""Local stand-in for the driver's DuckDB-differential check.

Runs each __spark_entry__.queries() entry and its oracle_sql() twin on
the same sf dir, then compares row count + sorted column names + an
order-insensitive sequence of canonicalized row strings.

FAITHFUL TO THE DRIVER (round-4 lesson): the driver materializes BOTH
sides as pandas frames (Spark `.toPandas()`, DuckDB `.df()`), sorts
columns by name, row-sorts with `DataFrame.sort_values` over every
column, then stringifies and hashes.  Two consequences we must
reproduce, because the round-4 local harness (native `fetchall()` +
list-tolerant canon) was green while the driver showed 3 reds:

* a list/array cell crashes `sort_values` (pandas factorize:
  "unhashable type: 'list'") — so any gated query with an Array/Map
  output column is a driver crash, full stop;
* DuckDB `.df()` renders DECIMAL as float64 ("3005007.0") while Spark
  `.toPandas()` keeps `decimal.Decimal` ("3005007.00") — so a DECIMAL
  output column hash-mismatches whenever a value has trailing-zero
  cents.

Hence this harness fetches via pandas on both sides, hard-fails any
frame containing list-like cells, and stringifies Decimals verbatim.
`lint_output_schema` additionally rejects Array/Map/Struct/Decimal/
Binary output columns up front so the failure is named, not a crash.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: Spark output types the driver's pandas canonicalizer cannot digest.
#: Array/Map/Struct -> unhashable cells (factorize crash); Decimal ->
#: rendering mismatch vs DuckDB's float64; Binary -> bytearray cells
#: from toPandas are unhashable too.
RISKY_TYPE_NAMES = ("ArrayType", "MapType", "StructType", "DecimalType", "BinaryType")


def lint_output_schema(schema) -> list[str]:
    """Return a list of 'col: type' strings for output columns whose
    type would crash or mis-hash in the driver's canonicalizer."""
    bad = []
    for f in schema.fields:
        tname = type(f.dataType).__name__
        if tname in RISKY_TYPE_NAMES:
            bad.append(f"{f.name}: {f.dataType.simpleString()}")
    return bad


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v):
    """Stringify one pandas cell the way the driver's hash sees it.

    Deliberately list-INTOLERANT: list-like cells raise, mirroring the
    driver's factorize crash (round-1 winnow_fingerprints, round-4
    collect_sorted_lines / label_centroids).
    """
    if isinstance(v, (list, tuple, dict, set, np.ndarray, bytearray, bytes)):
        raise TypeError(
            f"unhashable driver-canon cell of type {type(v).__name__}: "
            "gated outputs must serialize arrays/binary to strings"
        )
    if v is None:
        return "NULL"
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(round(f, 9))
    if isinstance(v, decimal.Decimal):
        # NOT normalized: trailing zeros stay, exactly as str(Decimal)
        # renders on the Spark side of the driver's compare.
        return str(v)
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        ts = v
        if getattr(ts, "tzinfo", None) is not None:
            ts = ts.tz_localize(None) if isinstance(ts, pd.Timestamp) else ts.replace(tzinfo=None)
        # DuckDB .df() widens DATE to a midnight Timestamp while Spark
        # toPandas keeps datetime.date; the driver grades those equal
        # (date_functions et al. were green in r4), so midnight
        # timestamps canonicalize to the date alone.
        if (ts.hour, ts.minute, ts.second, ts.microsecond) == (0, 0, 0, 0):
            return ts.date().isoformat()
        return ts.isoformat()
    if v is pd.NaT:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_frame(pdf: pd.DataFrame) -> list[str]:
    """Driver-faithful canonicalization: sort columns by name, row-sort
    with pandas sort_values over every column (this is where list
    cells crash, as they do in the driver), then stringify rows."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf) and cols:
        pdf = pdf.sort_values(by=cols, kind="mergesort")
    # Column-wise iteration (not iterrows) so per-column dtypes are
    # preserved — iterrows upcasts mixed frames and would render int64
    # cells as "3.0".
    col_strings = [[_canon_cell(v) for v in pdf[c].tolist()] for c in cols]
    return ["|".join(vals) for vals in zip(*col_strings)] if cols else []


def compare_query(spark, con, name: str, fn, sql: str | None, sf_dir: str):
    sdf = fn(spark, sf_dir)
    bad = lint_output_schema(sdf.schema)
    if bad:
        return {
            "name": name,
            "ok": False,
            "mode": "schema_lint",
            "error": f"driver-unsafe output columns: {bad}",
        }
    s_pdf = sdf.toPandas()
    result = {"name": name, "spark_rows": len(s_pdf)}
    if sql is None:
        result["mode"] = "rows_only"
        try:
            canon_frame(s_pdf)  # still exercises the crash-on-list path
        except TypeError as e:
            result["ok"] = False
            result["error"] = str(e)
            return result
        result["ok"] = True
        return result
    d_pdf = con.execute(sql).df()
    result["mode"] = "oracle"
    result["oracle_rows"] = len(d_pdf)
    cols_ok = sorted(s_pdf.columns) == sorted(d_pdf.columns)
    rows_ok = len(s_pdf) == len(d_pdf)
    vals_ok = False
    if cols_ok and rows_ok:
        vals_ok = canon_frame(s_pdf) == canon_frame(d_pdf)
    result["cols_ok"] = cols_ok
    result["rows_ok"] = rows_ok
    result["vals_ok"] = vals_ok
    result["ok"] = cols_ok and rows_ok and vals_ok
    if not cols_ok:
        result["spark_cols"] = list(s_pdf.columns)
        result["oracle_cols"] = list(d_pdf.columns)
    if cols_ok and rows_ok and not vals_ok:
        a = canon_frame(s_pdf)
        b = canon_frame(d_pdf)
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        result["first_diffs"] = diffs
    return result

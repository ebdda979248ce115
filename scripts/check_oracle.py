"""Run the full driver-style oracle check locally.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from oracle_harness import compare_query, duckdb_con  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from zoom_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb_con(sf_dir)
    qs = entry_mod.queries()
    oracle = entry_mod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = compare_query(spark, con, name, fn, oracle.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            res = {"name": name, "ok": False, "error": f"{type(e).__name__}: {e}"}
        status = "PASS" if res.get("ok") else "FAIL"
        if not res.get("ok"):
            n_fail += 1
        print(f"[{status}] {name}: { {k: v for k, v in res.items() if k != 'name'} }")
    print(f"\n{n_fail} failures / {len(only) if only else len(qs)} checked")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

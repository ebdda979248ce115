"""Flag queries whose formatted plan re-scans base parquet many times.

The r13 tfidf/ngram finding: a shared subtree consumed by k plan legs
with no materialization re-scans (and re-computes) the base table k
times — tfidf_cosine_pairs scanned documents.parquet 24x. This sweep
builds each query's frame, counts `Scan parquet` occurrences per table
in `.explain('formatted')`, and prints queries above a threshold so the
round can triage them. Construction-time jobs (counts/checkpoints in
iterative operators) DO execute, so run this in a quiet window.

Usage: python scripts/scan_fanout.py [sf_dir] [threshold] [query ...]
Defaults: /root/testdata/sf0.01, threshold 4, all registered queries.
"""

from __future__ import annotations

import io
import re
import sys
from collections import Counter
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from zoom_spark.session import get_spark, release_storage  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    qs = entry_mod.queries()
    names = sys.argv[3:] or list(qs)
    spark = get_spark("scan-fanout")
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            print(f"[ERR ] {name}: {exc}")
            continue
        tables = Counter(
            re.findall(r"InMemoryFileIndex \[[^\]]*/(\w+)\.parquet", plan)
        )
        worst = tables.most_common(1)
        if worst and worst[0][1] >= threshold:
            print(f"[FAN ] {name}: {dict(tables)}")
        del df
        release_storage(spark)
    print("done")


if __name__ == "__main__":
    main()

"""Benchmark harness — runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full execution with a noop write (no driver
collect cost) so the number reflects plan execution, not result
transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zoom_spark.session import get_spark  # noqa: E402

# Queries that represent each operator family; grows with the registry.
HEADLINE = [
    "flagship_delta",
    "groupby_multi_agg",
    "join_enrich",
    "union_pages_drift",
    "date_functions",
    "distinct_status",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("zoom-spark-bench")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n.startswith("bench_only_")
    ]
    # warm the JVM + parquet footers once so timings measure execution
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

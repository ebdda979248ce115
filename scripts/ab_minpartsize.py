"""A/B a runtime conf across a list of registered queries (r13).

Motivation: AQE coalescing is byte-based; on CPU-dense, small-byte
mid-plan stages (array_intersect explodes, md5 folds, pandas groups)
it coalesces post-shuffle partitions down to `minPartitionSize` (1MB
default) chunks — a handful of tasks on a 32-core session. This
script measures each query's steady state under the session default
and under an overridden conf value, interleaved A/B/A/B in one JVM so
ambient drift hits both sides equally.

Usage: python scripts/ab_minpartsize.py [sf_dir] conf_value query...
e.g.   python scripts/ab_minpartsize.py /root/testdata/sf0.1 64k \
           k_truss_copurchase theil_sen_revenue_trend
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zoom_spark.session import get_spark, release_storage  # noqa: E402

CONF = "spark.sql.adaptive.coalescePartitions.minPartitionSize"


def main() -> None:
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    else:
        sf_dir = "/root/testdata/sf0.1"
    conf_value, names = args[0], args[1:]
    runs = int(os.environ.get("AB_RUNS", "2"))
    spark = get_spark("ab-minpartsize")
    default = "1m"  # documented Spark default for this conf
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    for name in names:
        rows = {"A": [], "B": []}
        for _ in range(runs):
            for side, val in (("A", default), ("B", conf_value)):
                spark.conf.set(CONF, val)
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                rows[side].append(round(time.perf_counter() - t0, 2))
                release_storage(spark)
        spark.conf.set(CONF, default)
        out[name] = rows
        print(
            f"| {name} | A(default {default}): {rows['A']} -> "
            f"{min(rows['A'])} | B({conf_value}): {rows['B']} -> "
            f"{min(rows['B'])} |"
        )
    print(json.dumps({"sf_dir": sf_dir, "conf": conf_value, "results": out}))


if __name__ == "__main__":
    main()

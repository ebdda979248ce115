"""Evidence capture for the r14 known_range prefix_sum: the registered
queries hide the prefix machinery behind construction-time collects,
so this script explains the two-phase scan's local frame directly.
'before' = the r13 shape (repartitionByRange + derived _pid window:
TWO exchanges — the sampled range exchange plus the
ENSURE_REQUIREMENTS hash(_pid) one) and 'after' = the literal-bucket
shape (ONE hash exchange, no sampling pass).

Usage: python scripts/capture_prefix_scan_plan.py
Writes plans/r14/prefix_scan_{before,after}.txt.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from zoom_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("capture-prefix-scan")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    n, p = 150_000, 32
    df = spark.range(1, n + 1).select(F.col("id").alias("k")).withColumn(
        "lnk", F.log(F.col("k").cast("double"))
    )
    # before: r13 prefix_sum partitioning shape
    ranged = df.repartitionByRange(p, F.col("k")).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy("k")
    before = ranged.withColumn("_c", F.sum("lnk").over(w))
    # after: r14 known_range literal-bucket shape
    width = max(1, (n - 1 + p) // p)
    bucket = F.expr(f"CAST((CAST(k AS BIGINT) - 1) DIV {width} AS INT)")
    ranged2 = df.withColumn("_pid", bucket).repartition(p, F.col("_pid"))
    after = ranged2.withColumn("_c", F.sum("lnk").over(w))
    for tag, frame in (("before", before), ("after", after)):
        buf = io.StringIO()
        with redirect_stdout(buf):
            frame.explain("formatted")
        path = os.path.join(out_dir, f"prefix_scan_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()

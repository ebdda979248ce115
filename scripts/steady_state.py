"""Isolated steady-state timing for bench-line adjudication.

The per-round driver bench runs ~580 queries in one JVM, so any line
can be inflated by family cold-start, codegen warm-up, or adjacent
heavy queries (rounds 5/9/10 lessons). Per the round-over-round rule,
a mover is adjudicated by an ISOLATED multi-run in a quiet JVM: run 1
pays session+codegen warm-up, steady = min of the later runs.

Usage: python scripts/steady_state.py [sf_dir] query [query ...]
       (env STEADY_RUNS=3 to override the run count)

Prints one markdown table row per query (run list + steady) and a
final JSON line for scripting. Run this with NO other Spark job on
the machine — a concurrent JVM distorts the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zoom_spark.session import get_spark, release_storage  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    if not names:
        print("usage: steady_state.py [sf_dir] query [query ...]", file=sys.stderr)
        sys.exit(2)
    runs = int(os.environ.get("STEADY_RUNS", "3"))
    spark = get_spark("steady-state")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    # Same warm-up as bench.py: parquet footers + join/agg/window codegen.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).limit(1000)
    warm = (
        li.limit(1000)
        .join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.sum("l_quantity").alias("q"))
        .withColumn("r", F.row_number().over(Window.orderBy("o_orderstatus")))
    )
    warm.write.format("noop").mode("overwrite").save()
    li.count()
    # r14: warm the PYTHON-WORKER POOL as well. The first query that
    # fans a mapInPandas/applyInPandas across every core otherwise
    # pays the whole pool spawn (one Python process + pyspark/pandas
    # import per core) inside ITS timed span — measured this round:
    # multimodal_decode_wav_ppm read 10.5 s cold in bench context vs
    # 1.6 s with the pool already spawned, and the driver's r13 line
    # (13.2 s) carried the same artifact. Same declared intent as the
    # JIT/codegen warmup above: timings measure execution, not
    # first-use session infrastructure. NOTE (measurement change,
    # r14): lines for whichever query previously hit the cold pool
    # (r13: multimodal_decode_wav_ppm) drop by the spawn cost; earlier
    # rounds' numbers include it.
    _p = spark.sparkContext.defaultParallelism

    def _warm_workers(batches):
        for pdf in batches:
            yield pdf

    spark.range(0, _p, 1, _p).mapInPandas(_warm_workers, "id long").write.format(
        "noop"
    ).mode("overwrite").save()


    out: dict[str, dict] = {}
    for name in names:
        times: list[float] = []
        for _ in range(runs):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 2))
            # same between-run hygiene as bench.py — accumulated
            # checkpoint blocks from run k otherwise inflate run k+1
            # (pagerank rose 13.6 -> 18.5 across a triple before this)
            release_storage(spark)
        steady = min(times[1:]) if len(times) > 1 else times[0]
        out[name] = {"runs": times, "steady": steady}
        print(
            f"| {name} | {' / '.join(str(t) for t in times)} | **{steady}** |"
        )
    print(json.dumps({"sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()

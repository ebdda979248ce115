"""Phase probe for k_truss_copurchase (r13): time edge build, triangle
enumeration and full query under (a) current code, (b) spread_scan on
the lineitem scan, (c) optionally a smaller AQE minPartitionSize —
to adjudicate whether the r12 "volume-inherent" phases are actually
parallelism-starved (single-split scan + byte-based AQE coalescing of
CPU-dense, small-byte stages).

Usage: python scripts/probe_ktruss_phases.py [sf_dir] [minPartitionSize]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zoom_spark.io import load_table, spread_scan  # noqa: E402
from zoom_spark.session import get_spark, release_storage  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s")
    return out


def edges_frame(spark, sf_dir, spread: bool):
    src = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    if spread:
        src = spread_scan(src)
    grp = src.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    return (
        grp.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i+2, size(ps)), "
                    "y -> struct(x as u, y as v))))"
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("probe-ktruss")
    if len(sys.argv) > 2:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            sys.argv[2],
        )
        print("minPartitionSize =", sys.argv[2])
    # warmup
    li = load_table(spark, sf_dir, "lineitem")
    noop(li.groupBy("l_returnflag").count())

    from zoom_spark.operators.graph import k_truss, orient_edges

    for tag, spread in (("base", False), ("spread", True)):
        for rep in range(2):
            e = edges_frame(spark, sf_dir, spread)
            timed(f"[{tag} r{rep}] edge build", lambda: noop(e))
            release_storage(spark)
        # triangle enumeration phase on top of a checkpointed edge set
        e = edges_frame(spark, sf_dir, spread).localCheckpoint(eager=False)
        oriented = orient_edges(e, src="u", dst="v").localCheckpoint(
            eager=False
        )
        adj = oriented.groupBy("src").agg(
            F.collect_set("dst").alias("nbrs")
        )
        tri = (
            oriented.select("src", "dst")
            .join(
                adj.select(F.col("src").alias("_a"), F.col("nbrs").alias("na")),
                on=F.col("src") == F.col("_a"),
            )
            .join(
                adj.select(F.col("src").alias("_b"), F.col("nbrs").alias("nb")),
                on=F.col("dst") == F.col("_b"),
            )
            .select(
                "src",
                "dst",
                F.explode(F.array_intersect("na", "nb")).alias("w"),
            )
        )
        timed(f"[{tag}] orient+adj+tri enum", lambda: noop(tri))
        release_storage(spark)
        for rep in range(2):
            full = k_truss(
                edges_frame(spark, sf_dir, spread), k=4, assume_deduped=True
            ).orderBy("u", "v")
            timed(f"[{tag} r{rep}] full k_truss", lambda: noop(full))
            release_storage(spark)


if __name__ == "__main__":
    main()

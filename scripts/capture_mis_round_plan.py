"""Capture the round-1 plan of luby_maximal_independent_set's rm frame.

The registered query returns a 1-row literal summary (the loop collects
scalars), so .explain of the final frame shows nothing — the evidence
for the r13 broadcast change is the shape of a ROUND frame. This
replicates the function's construction exactly through round 1's rm
frame (the candidate-neighborhood removal set: the c-join plus both
e-side lookups, i.e. every join the r13 change touches) and explains it
with the broadcast gate on (after) or forced off (before).

Usage: python scripts/capture_mis_round_plan.py <before|after>
Writes plans/r13/luby_maximal_independent_set_<tag>.txt.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zoom_spark.io import load_table  # noqa: E402
from zoom_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    assert tag in ("before", "after"), tag
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-mis-round-plan")

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a0 = li.select(F.col("l_orderkey").alias("oa"), F.col("l_partkey").alias("pu"))
    b0 = li.select(F.col("l_orderkey").alias("ob"), F.col("l_partkey").alias("pv"))
    sup = (
        a0.join(b0, (F.col("oa") == F.col("ob")) & (F.col("pu") < F.col("pv")))
        .groupBy(F.col("pu").alias("u"), F.col("pv").alias("v"))
        .agg(F.count("*").alias("s"))
        .where(F.col("s") >= 2)
        .select("u", "v")
        .localCheckpoint(eager=False)
    )
    prio = (
        sup.select(F.col("u").alias("x"))
        .unionAll(sup.select(F.col("v").alias("x")))
        .distinct()
        .select(
            "x",
            (
                F.conv(
                    F.substring(F.md5(F.col("x").cast("string")), 1, 10), 16, 10
                ).cast("long")
                * 1000000
                + F.col("x")
            ).alias("p"),
        )
        .localCheckpoint(eager=False)
    )
    v = prio
    n_vertices = v.count()
    from zoom_spark.operators.graph import BCAST_MAX_ROWS

    small = tag == "after" and n_vertices <= BCAST_MAX_ROWS
    bc = (lambda df: F.broadcast(df)) if small else (lambda df: df)
    e = (
        sup.join(
            bc(prio.select(F.col("x").alias("xu"), F.col("p").alias("pu_"))),
            F.col("u") == F.col("xu"),
        )
        .join(
            bc(prio.select(F.col("x").alias("xv"), F.col("p").alias("pv_"))),
            F.col("v") == F.col("xv"),
        )
        .select("u", "v", F.col("pu_").alias("pu"), F.col("pv_").alias("pv"))
        .localCheckpoint(eager=False)
    )
    e.count()
    nbrmin = (
        e.select(F.col("u").alias("x"), F.col("pv").alias("p"))
        .unionAll(e.select(F.col("v").alias("x"), F.col("pu").alias("p")))
        .groupBy("x")
        .agg(F.min("p").cast("long").alias("mp"))
    )
    c = (
        v.join(bc(nbrmin), on="x", how="left")
        .where(F.col("mp").isNull() | (F.col("p") < F.col("mp")))
        .select("x")
        .localCheckpoint(eager=False)
    )
    rm = (
        c.select("x")
        .unionAll(
            e.join(bc(c.select(F.col("x").alias("cu"))), F.col("u") == F.col("cu"))
            .select(F.col("v").alias("x"))
        )
        .unionAll(
            e.join(bc(c.select(F.col("x").alias("cv"))), F.col("v") == F.col("cv"))
            .select(F.col("u").alias("x"))
        )
        .distinct()
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        rm.explain("formatted")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    path = os.path.join(out_dir, f"luby_maximal_independent_set_{tag}.txt")
    with open(path, "w") as f:
        f.write(
            "# round-1 rm frame (candidate set + both e-side lookups);\n"
            "# the registered query's final frame is a 1-row literal\n"
            "# summary, so the round frame is the plan evidence.\n"
        )
        f.write(buf.getvalue())
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

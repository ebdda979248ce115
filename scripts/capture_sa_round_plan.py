"""Evidence capture for the r14 suffix-array loop rewrite: the
registered query's final fragment hides the doubling rounds behind
localCheckpoint leaves, so this script rebuilds the FIRST COMPRESS
round's frame (after the chained map-combine rounds) and explains it —
the 'after' plan shows the map rounds as a single doc_id exchange +
chained Window ops with NO per-round range shuffle/join; the 'before'
plan (r13 code, run from a worktree at the r13 HEAD) shows the
per-round distinct + range shuffle + join-back detour.

Usage: python scripts/capture_sa_round_plan.py <before|after>
Writes plans/r14/suffix_array_round_<tag>.txt.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from zoom_spark.functions.text import ws_tokens  # noqa: E402
from zoom_spark.io import load_table  # noqa: E402
from zoom_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    assert tag in ("before", "after"), tag
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-sa-round")
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(ws_tokens(F.lower("text"))).alias("pos", "w")
    ).localCheckpoint(eager=False)
    from zoom_spark.operators.prefix import global_row_number

    n_classes: list = []
    vocab = global_row_number(
        tok.select("w").distinct(), ["w"], out_col="r", count_out=n_classes
    )
    cur = tok.join(vocab, on="w").select("doc_id", "pos", "r")
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    if tag == "after":
        # three chained map-combine rounds, then the compress round's
        # paired frame (the frame global_dense_rank range-shuffles)
        bound = n_classes[-1]
        k = 1
        for _ in range(3):
            r2 = F.coalesce(F.lead("r", k).over(wdoc), F.lit(0).cast("bigint"))
            cur = cur.select(
                "doc_id", "pos",
                (F.col("r").cast("bigint") * F.lit(bound + 1) + r2).alias("r"),
            )
            bound = (bound + 1) * (bound + 1) - 1
            k *= 2
        frame = cur.select(
            "doc_id", "pos", "r",
            F.coalesce(F.lead("r", k).over(wdoc), F.lit(0).cast("bigint")).alias("r2"),
        )
    else:
        # one r13-style round: positional self-join + distinct +
        # global_row_number + join-back
        k = 1
        nxt = cur.select(
            F.col("doc_id").alias("doc_id2"),
            (F.col("pos") - k).alias("pos2"),
            F.col("r").alias("r2"),
        )
        paired = cur.join(
            nxt,
            (F.col("doc_id") == F.col("doc_id2"))
            & (F.col("pos") == F.col("pos2")),
            "left",
        ).select("doc_id", "pos", "r", F.coalesce("r2", F.lit(0)).alias("r2"))
        ranks = global_row_number(
            paired.select("r", "r2").distinct(), ["r", "r2"], out_col="nr"
        )
        frame = paired.join(ranks, on=["r", "r2"]).select(
            "doc_id", "pos", F.col("nr").alias("r")
        )
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    buf = io.StringIO()
    with redirect_stdout(buf):
        frame.explain("formatted")
    path = os.path.join(out_dir, f"suffix_array_round_{tag}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

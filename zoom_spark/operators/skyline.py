"""2-D skyline (Pareto frontier) — keep rows not strictly dominated
on a (minimize, maximize) objective pair, e.g. "cheapest orders that
are also the most recent".

The naive spelling is a quadratic NOT EXISTS self-join (every row
checks every other row) — dead on arrival at scale. For two
dimensions there is an O(n log n) sort-scan formulation:

  1. collapse to one row per distinct minimize-value with the MAX of
     the maximize-value in that group (only the best row of a group
     can dominate anything);
  2. running max of that best value over STRICTLY SMALLER
     minimize-values (an exclusive prefix-max scan in minimize
     order);
  3. a row survives iff no strictly-cheaper group achieved a strictly
     larger maximize-value.

Step 2 is the scale-sensitive part: a global ORDER BY window is one
task. We reuse :func:`zoom_spark.operators.prefix.prefix_max` — the
two-phase range-partitioned scan — so the whole skyline is two
shuffles (group-by + range) plus an O(P) driver offset exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zoom_spark.operators.prefix import prefix_max


def skyline_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows of `df` not strictly dominated: no other row has
    `minimize_col` strictly smaller AND `maximize_col` strictly
    larger. `maximize_col` must be BIGINT-comparable (cast before
    calling). Ties on either axis do not dominate."""
    groups = df.groupBy(minimize_col).agg(
        F.max(maximize_col).alias("_grp_best")
    )
    scanned = prefix_max(
        groups,
        order_col=minimize_col,
        value_col="_grp_best",
        out_col="_best_cheaper",
        exclusive=True,
        num_partitions=num_partitions,
    ).select(minimize_col, "_best_cheaper")
    return (
        df.join(scanned, on=minimize_col)
        .where(
            F.col("_best_cheaper").isNull()
            | (F.col("_best_cheaper") <= F.col(maximize_col))
        )
        .drop("_best_cheaper")
    )

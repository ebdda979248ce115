"""As-of (most-recent-prior) join — SURVEY.md §2.3 'Absent' row.

Spark has no built-in as-of join; the idiomatic large-scale
composition used here is the union-and-window trick:

    tag left rows (kind=1) and right rows (kind=0), union them,
    then last_value(right_ts) IGNORE NULLS over
    (partition by key order by ts, kind) gives every left row the
    most recent right row at-or-before its timestamp.

This costs exactly ONE shuffle (by key) regardless of table sizes —
versus the naive theta-join (key AND r.ts <= l.ts) which explodes to
a per-key cross product. Equal timestamps resolve as right-row-first
(kind 0 < 1), matching the >= semantics of DuckDB's ASOF JOIN, which
serves as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right.ts <= left.ts within the same key (null if none)."""
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__kind"),
        F.struct(*left.columns).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_value_cols],
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__kind"),
        F.lit(None).cast(lt.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lt.unionByName(rt)
    filled = unioned.select(
        "__kind",
        "__left",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__rv_{c}")
            for c in right_value_cols
        ],
    )
    out = filled.where(F.col("__kind") == 1).select(
        F.col("__left.*"),
        *[F.col(f"__rv_{c}").alias(f"r_{c}") for c in right_value_cols],
    )
    return out

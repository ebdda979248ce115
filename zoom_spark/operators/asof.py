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
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row: columns of the nearest right row within the
    same key (null if none) — ``backward`` takes the latest right row
    with right.ts <= left.ts, ``forward`` the earliest with
    right.ts >= left.ts (both inclusive, matching DuckDB ASOF's >= /
    <= semantics).  ``tolerance_us`` (microseconds) nulls the match
    when the time gap exceeds it — pandas merge_asof's tolerance, as
    a post-window column expression (the nearest match is by
    definition the only candidate, so nulling it is exact).  Cost is
    one shuffle by key either way."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
    # forward: right rows must sort AFTER left at equal ts so the
    # following-frame window still sees an equal-ts match
    r_kind = 0 if direction == "backward" else 2
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__kind"),
        F.struct(*left.columns).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_matchts"),
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(r_kind).alias("__kind"),
        F.lit(None).cast(lt.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        F.col(right_ts).alias("__r_matchts"),
    )
    base = Window.partitionBy("__k").orderBy("__ts", "__kind")
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        fill = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    unioned = lt.unionByName(rt)
    filled = unioned.select(
        "__kind",
        "__left",
        "__ts",
        fill("__r_matchts").alias("__rv_matchts"),
        *[fill(f"__r_{c}").alias(f"__rv_{c}") for c in right_value_cols],
    )
    if tolerance_us is None:
        keep = F.lit(True)
    else:
        gap = (
            F.unix_micros("__rv_matchts") - F.unix_micros("__ts")
            if direction == "forward"
            else F.unix_micros("__ts") - F.unix_micros("__rv_matchts")
        )
        keep = F.col("__rv_matchts").isNotNull() & (gap <= tolerance_us)
    out = filled.where(F.col("__kind") == 1).select(
        F.col("__left.*"),
        *[
            F.when(keep, F.col(f"__rv_{c}")).alias(f"r_{c}")
            for c in right_value_cols
        ],
    )
    return out

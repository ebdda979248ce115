"""Interval (point-in-range) join — SURVEY.md §2.3 "range/interval
join" row, built scale-first.

The naive plan for ``points.join(intervals, point BETWEEN start AND
end)`` with no equi key is BroadcastNestedLoopJoin — O(|P|·|I|) and
only viable when one side broadcasts. The standard distributed fix
(bucketed banding, as in Flink/interval-join and range-join
implementations in public engines) turns the range predicate into an
equi key:

  * bucket time into fixed-width bins;
  * a point belongs to exactly ONE bin; an interval is exploded to
    every bin it overlaps;
  * equi-join on (keys..., bin), then re-check the exact range
    predicate as a post-probe filter.

Each (point, interval) pair meets in exactly one bin (the point's),
so no distinct pass is needed. Shuffle volume is |P| + Σ
interval_spans/width — tunable via `bucket` so interval explosion
stays O(1) per interval. With a small intervals side Catalyst still
broadcasts the exploded frame and the whole thing is map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US_PER_SECOND = 1_000_000


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    start <= point < end (end-exclusive), optionally also matching on
    equi `keys`."""
    # keys may be "name" (same on both sides) or (point_key,
    # interval_key) pairs — distinct names sidestep self-join attribute
    # ambiguity when the intervals frame derives from the points frame
    pairs = [(k, k) if isinstance(k, str) else k for k in (keys or [])]
    width = F.lit(bucket_seconds * _US_PER_SECOND)
    p = points.withColumn("_bucket", F.floor(F.unix_micros(F.col(point_col)) / width))
    i = intervals.withColumn(
        "_b_start", F.floor(F.unix_micros(F.col(start_col)) / width)
    ).withColumn(
        # end-exclusive: an interval ending exactly on a bin edge does
        # not overlap that bin
        "_b_end",
        F.floor((F.unix_micros(F.col(end_col)) - 1) / width),
    )
    exploded = i.withColumn(
        "_bucket", F.explode(F.sequence("_b_start", "_b_end"))
    ).drop("_b_start", "_b_end")
    cond = [p["_bucket"] == exploded["_bucket"]] + [
        p[pk] == exploded[ik] for pk, ik in pairs
    ]
    in_range = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) < F.col(end_col)
    )
    return p.join(exploded, cond).where(in_range).drop("_bucket")


def empty_intervals(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Intervals containing no point (gap report): the interval side
    anti-joined against the matched interval set."""
    pairs = [(k, k) if isinstance(k, str) else k for k in (keys or [])]
    ikeys = [ik for _, ik in pairs]
    matched = interval_join(
        points,
        intervals,
        point_col=point_col,
        start_col=start_col,
        end_col=end_col,
        keys=keys,
        bucket_seconds=bucket_seconds,
    ).select(*ikeys, start_col, end_col).distinct()
    return intervals.join(matched, ikeys + [start_col, end_col], "left_anti")

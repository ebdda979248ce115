"""Event-time window queries over the `events` table (SURVEY.md §2.9).

Batch forms of tumbling / sliding / session windows — DuckDB-checkable
via time_bucket and gaps-and-islands SQL. The Structured Streaming
variants (withWatermark + the same window exprs) live in
zoom_spark/streaming/ and are pytest-gated (the driver compare is
batch-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.queries import register


@register(
    "tumbling_window_events",
    sql="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate — window() is epoch-aligned,
    matching DuckDB's time_bucket."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "sliding_window_events",
    sql="""
    WITH buckets AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, value FROM events
    )
    SELECT window_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value
    FROM buckets
    GROUP BY 1
    """,
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 30 min slide): each event lands in
    two windows; oracle expands the assignment explicitly."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@register(
    "session_window_events",
    sql="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) AS session_last_event,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30 min inactivity gap) per user. Spark's
    session_window merges events whose windows overlap; the oracle is
    the classic gaps-and-islands rewrite. Outputs min/max event time
    (not the gap-padded window end) so both sides agree exactly."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last_event"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "session_last_event", "n_events")
    )


@register(
    "interval_join_campaigns",
    sql="""
    WITH bounds AS (SELECT min(ts) AS t0 FROM events),
    win AS (
      SELECT et.event_type, g.i AS window_id,
             t0 + (g.i * 96) * INTERVAL 1 HOUR AS w_start,
             t0 + (g.i * 96 + 36) * INTERVAL 1 HOUR AS w_end
      FROM (SELECT DISTINCT event_type FROM events) et
      CROSS JOIN bounds
      CROSS JOIN generate_series(0, 5) AS g(i)
    )
    SELECT w.event_type, w.window_id, CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE), 2)
             AS total_value
    FROM win w
    JOIN events e ON e.event_type = w.event_type
                 AND e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY w.event_type, w.window_id
    """,
)
def interval_join_campaigns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (SURVEY §2.3 range-join row, the non-equi case):
    events land in deterministic 36-hour "campaign windows" (6 per
    event type, spaced 96 h from the global min timestamp). Runs
    through operators/interval.interval_join — bucketed banding turns
    the range predicate into an equi key (one bin per point, interval
    exploded to overlapped bins), so the plan is a hash join + residual
    filter, never a nested loop over the fact side."""
    from zoom_spark.operators.interval import interval_join

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.min("ts").alias("t0"))
    types = ev.select("event_type").distinct()
    win = (
        types.crossJoin(F.broadcast(bounds))
        .crossJoin(
            F.broadcast(
                spark.range(6).select(F.col("id").cast("bigint").alias("window_id"))
            )
        )
        .select(
            F.col("event_type").alias("w_event_type"),
            "window_id",
            (
                F.col("t0")
                + (F.col("window_id") * 96).cast("int") * F.expr("INTERVAL 1 HOUR")
            ).alias("w_start"),
            (
                F.col("t0")
                + (F.col("window_id") * 96 + 36).cast("int")
                * F.expr("INTERVAL 1 HOUR")
            ).alias("w_end"),
        )
    )
    joined = interval_join(
        ev,
        win,
        point_col="ts",
        start_col="w_start",
        end_col="w_end",
        keys=[("event_type", "w_event_type")],
        bucket_seconds=86400,
    )
    return (
        joined.groupBy(F.col("w_event_type").alias("event_type"), "window_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
            ).alias("total_value"),
        )
        .select("event_type", "window_id", "n_events", "total_value")
    )


@register(
    "campaign_gap_report",
    sql="""
    WITH bounds AS (SELECT min(ts) AS t0 FROM events),
    win AS (
      SELECT et.event_type, g.i AS window_id,
             t0 + (g.i * 96) * INTERVAL 1 HOUR AS w_start,
             t0 + (g.i * 96 + 1) * INTERVAL 1 HOUR AS w_end
      FROM (SELECT DISTINCT event_type FROM events) et
      CROSS JOIN bounds
      CROSS JOIN generate_series(0, 29) AS g(i)
    )
    SELECT w.event_type, w.window_id
    FROM win w
    WHERE NOT EXISTS (
      SELECT 1 FROM events e
      WHERE e.event_type = w.event_type
        AND e.ts >= w.w_start AND e.ts < w.w_end
    )
    """,
)
def campaign_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap report via operators/interval.empty_intervals: 1-hour probe
    windows (30 per event type) with no event — the monitoring
    counterpart of interval_join_campaigns, exercising the anti-join
    path over the bucketed interval machinery."""
    from zoom_spark.operators.interval import empty_intervals

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.min("ts").alias("t0"))
    win = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .crossJoin(
            F.broadcast(
                spark.range(30).select(F.col("id").cast("bigint").alias("window_id"))
            )
        )
        .select(
            F.col("event_type").alias("w_event_type"),
            "window_id",
            (
                F.col("t0")
                + (F.col("window_id") * 96).cast("int") * F.expr("INTERVAL 1 HOUR")
            ).alias("w_start"),
            (
                F.col("t0")
                + (F.col("window_id") * 96 + 1).cast("int")
                * F.expr("INTERVAL 1 HOUR")
            ).alias("w_end"),
        )
    )
    return empty_intervals(
        ev,
        win,
        point_col="ts",
        start_col="w_start",
        end_col="w_end",
        keys=[("event_type", "w_event_type")],
        bucket_seconds=86400,
    ).select(F.col("w_event_type").alias("event_type"), "window_id")


@register(
    "sessionize_events_sql",
    sql="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             -- deterministic tie-break: (ts, event_id) on BOTH windows
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sess
    GROUP BY user_id, session_seq
    """,
)
def sessionize_events_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via the lag-gap + running-sum pattern (the
    SQL classic; session_window_events covers the built-in). One
    shuffle on user_id serves both window passes and the final
    aggregate — the partitioning is reused across all three."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    prev = F.lag("ts").over(by_user)
    new_sess = F.when(
        prev.isNull()
        | (F.col("ts").cast("long") - prev.cast("long") > 1800),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_sess)
        .withColumn("session_seq", F.sum("new_session").over(run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("bigint").alias("session_seq"),
            "n_events",
            "session_start",
            "session_end",
        )
    )

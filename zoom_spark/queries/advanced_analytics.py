"""Advanced analytics operators (round-2 continuation): time-series
linear interpolation, statistical anomaly detection, bitmap (bitset)
aggregates, MATCH_RECOGNIZE-style event-sequence matching, 2-D
skyline, graph triangle counting, and content-defined chunking.

Each query is the batch/oracle-gated face of a reusable operator
(operators/skyline.py, operators/graph.py, operators/prefix.py,
functions/cdc.py). Determinism rules follow the repo conventions:
exact DECIMAL partial sums before any double math, identical
arithmetic expression order on both engines, explicit tie-breaks on
every ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zoom_spark.functions.cdc import cdc_chunks
from zoom_spark.io import load_table
from zoom_spark.operators.graph import triangle_count
from zoom_spark.operators.skyline import skyline_2d
from zoom_spark.queries import register

# Saturdays+Sundays of Jan 2024 as day-offsets from Mon 2024-01-01:
# {5,6,12,13,19,20,26,27} -> sum(2^i) = 202911840.
_WEEKEND_MASK = 202911840


@register(
    "linear_interp_fill",
    sql="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             sum(CAST(value AS DECIMAL(18,6))) AS day_sum,
             CAST(count(*) AS BIGINT) AS day_cnt
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
    grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM span
    ),
    j AS (
      SELECT g.user_id, g.day, d.day_sum, d.day_cnt
      FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    ),
    w AS (
      SELECT user_id, day, day_sum, day_cnt,
             last_value(CASE WHEN day_sum IS NOT NULL
                             THEN CAST(day_sum AS DOUBLE) / day_cnt END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
             last_value(CASE WHEN day_sum IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
             first_value(CASE WHEN day_sum IS NOT NULL
                              THEN CAST(day_sum AS DOUBLE) / day_cnt END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
             first_value(CASE WHEN day_sum IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
      FROM j
    )
    SELECT user_id, day,
           -- floor(x*1e4 + 0.5)/1e4, NOT round(x, 4): both engines'
           -- round() implementations disagree on last-digit boundary
           -- values; the floor form is pure IEEE arithmetic on
           -- bit-identical doubles, so it cannot diverge.
           floor((CASE WHEN day_sum IS NOT NULL
                       THEN CAST(day_sum AS DOUBLE) / day_cnt
                       ELSE prev_v + (next_v - prev_v)
                            * ((day - prev_d) / (next_d - prev_d)) END)
                 * 10000 + 0.5) / 10000.0 AS filled_value,
           day_sum IS NOT NULL AS is_observed
    FROM w
    """,
)
def linear_interp_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series linear interpolation onto a dense per-user daily
    grid (the step beyond LOCF: missing days get the straight line
    between the neighboring observed days, not a copy of the last
    one). Daily means come from exact DECIMAL sums so both engines
    interpolate from bit-identical doubles. Shape: one shuffle on
    user_id serves the daily agg, the grid explode (sequence +
    explode, JVM-side), and all four IGNORE-NULLS window passes."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("day_sum"),
        F.count("*").alias("day_cnt"),
    )
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    j = grid.join(daily, on=["user_id", "day"], how="left")
    avg = F.col("day_sum").cast("double") / F.col("day_cnt")
    observed = F.col("day_sum").isNotNull()
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wnext = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last(F.when(observed, avg), ignorenulls=True).over(wprev)
    prev_d = F.last(F.when(observed, F.col("day")), ignorenulls=True).over(wprev)
    next_v = F.first(F.when(observed, avg), ignorenulls=True).over(wnext)
    next_d = F.first(F.when(observed, F.col("day")), ignorenulls=True).over(wnext)
    frac = F.datediff(F.col("day"), prev_d) / F.datediff(next_d, prev_d)
    filled = F.when(observed, avg).otherwise(prev_v + (next_v - prev_v) * frac)
    # floor(x*1e4 + 0.5)/1e4 instead of round(x, 4): Spark rounds the
    # exact BigDecimal of the double, DuckDB rounds via a multiply
    # trick — they disagree on last-digit boundaries. The floor form
    # is plain IEEE arithmetic, identical on identical inputs.
    return j.select(
        "user_id",
        "day",
        (F.floor(filled * 10000 + 0.5) / F.lit(10000.0)).alias(
            "filled_value"
        ),
        observed.alias("is_observed"),
    )


@register(
    "zscore_anomaly_events",
    sql="""
    WITH stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(value AS DECIMAL(18,6))) AS s,
             sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS ss
      FROM events GROUP BY 1
    ),
    scored AS (
      SELECT e.event_id, e.event_type, e.value,
             CASE WHEN st.n > 1
                   AND (CAST(st.ss AS DOUBLE)
                        - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE) / st.n)
                       / (st.n - 1) > 0
                  THEN (e.value - CAST(st.s AS DOUBLE) / st.n)
                     / sqrt((CAST(st.ss AS DOUBLE)
                             - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE) / st.n)
                            / (st.n - 1))
             END AS z
      FROM events e JOIN stats st ON e.event_type = st.event_type
    )
    SELECT event_id, event_type, value,
           -- engine-neutral 4dp quantization (see linear_interp_fill)
           floor(z * 10000 + 0.5) / 10000.0 AS zscore
    FROM scored WHERE abs(z) > 2.5
    """,
)
def zscore_anomaly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical anomaly detection: per-event-type z-score from
    exact DECIMAL sum / sum-of-squares (mean and sample variance
    derived in double with an identical expression on both engines),
    flagging |z| > 2.5. The 5-row stats table broadcasts; the scan
    stays a single pass."""
    ev = load_table(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(18,6)")
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(vdec).alias("s"),
        F.sum(vdec * vdec).alias("ss"),
    )
    s_d = F.col("s").cast("double")
    ss_d = F.col("ss").cast("double")
    mean = s_d / F.col("n")
    var = (ss_d - s_d * s_d / F.col("n")) / (F.col("n") - 1)
    # Zero-variance guard: a constant-valued (or n=1) group would
    # produce Inf/NaN whose quantization semantics differ between
    # engines; gate z on var > 0 (NULL rows drop in the |z| filter,
    # mirrored by the oracle's CASE WHEN).
    z = F.when(
        (F.col("n") > 1) & (var > 0),
        (F.col("value") - mean) / F.sqrt(var),
    )
    return (
        ev.join(F.broadcast(stats), on="event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            z.alias("z"),
        )
        .where(F.abs(F.col("z")) > 2.5)
        .select(
            "event_id",
            "event_type",
            "value",
            (F.floor(F.col("z") * 10000 + 0.5) / F.lit(10000.0)).alias(
                "zscore"
            ),
        )
    )


@register(
    "bitmap_day_activity",
    sql=f"""
    WITH m AS (
      SELECT user_id,
             bit_or(CAST(pow(2, CAST(ts AS DATE) - DATE '2024-01-01') AS BIGINT))
               AS activity_mask,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    )
    SELECT user_id, activity_mask,
           CAST(bit_count(activity_mask) AS BIGINT) AS n_active_days,
           CAST(bit_count(activity_mask & {_WEEKEND_MASK}) AS BIGINT)
             AS n_weekend_days,
           n_events
    FROM m
    """,
)
def bitmap_day_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap index aggregate: each user's active days as a 30-bit
    set in ONE BIGINT via bit_or(2^day_offset) — the
    roaring-bitmap-style engagement encoding. Set cardinality and
    set-intersection queries (weekend activity) become bit_count and
    bitwise AND on a single column, no joins, no arrays. Partial
    bit_or combines map-side, so the shuffle moves one long per
    (user, partition)."""
    ev = load_table(spark, sf_dir, "events")
    day_idx = F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01")))
    day_bit = F.pow(F.lit(2.0), day_idx).cast("bigint")
    m = ev.groupBy("user_id").agg(
        F.bit_or(day_bit).alias("activity_mask"),
        F.count("*").alias("n_events"),
    )
    return m.select(
        "user_id",
        "activity_mask",
        F.bit_count("activity_mask").cast("bigint").alias("n_active_days"),
        F.bit_count(
            F.col("activity_mask").bitwiseAND(F.lit(_WEEKEND_MASK))
        )
        .cast("bigint")
        .alias("n_weekend_days"),
        "n_events",
    )


@register(
    "event_pattern_sessions",
    sql="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    ),
    g AS (
      SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
             CAST(count(*) AS BIGINT) AS n_events,
             string_agg(event_type, ',' ORDER BY ts, event_id) AS event_seq,
             min(ts) AS session_start
      FROM sess GROUP BY user_id, session_seq
    )
    SELECT user_id, session_seq, n_events, event_seq, session_start
    FROM g
    WHERE regexp_matches(event_seq, '(^|,)view(,click)*,purchase(,|$)')
    """,
)
def event_pattern_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE analog: sessionize (30-min gap), serialize each
    session's event types in (ts, event_id) order, and keep sessions
    containing the contiguous pattern view (click)* purchase — regex
    over the serialized sequence, the classic funnel-with-pattern
    formulation for engines without MATCH_RECOGNIZE. One shuffle on
    user_id serves both window passes and the aggregate; the ordered
    serialization is array_sort(collect_list(struct)) so the
    tie-break is explicit, not partition-order luck."""
    ev = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = by_user.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag("ts").over(by_user)
    # Microsecond-exact gap (unix_micros) to match the oracle's
    # INTERVAL comparison — cast('long') truncates to seconds and
    # would mis-sessionize a gap in (1800 s, 1801 s).
    new_sess = F.when(
        prev.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > 1_800_000_000),
        1,
    ).otherwise(0)
    grouped = (
        ev.withColumn("new_session", new_sess)
        .withColumn("session_seq", F.sum("new_session").over(run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
                ",",
            ).alias("event_seq"),
            F.min("ts").alias("session_start"),
        )
    )
    return grouped.where(
        F.col("event_seq").rlike("(^|,)view(,click)*,purchase(,|$)")
    ).select(
        "user_id",
        F.col("session_seq").cast("bigint").alias("session_seq"),
        "n_events",
        "event_seq",
        "session_start",
    )


@register(
    "skyline_orders",
    sql="""
    WITH g AS (
      SELECT o_totalprice AS price,
             max(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS grp_best
      FROM orders GROUP BY 1
    ),
    w AS (
      SELECT price,
             max(grp_best) OVER (ORDER BY price
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS best_cheaper
      FROM g
    )
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
    FROM orders o JOIN w ON o.o_totalprice = w.price
    WHERE w.best_cheaper IS NULL
       OR w.best_cheaper <= CAST(o.o_orderdate AS DATE) - DATE '1970-01-01'
    """,
)
def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline: orders not strictly dominated on (cheaper price,
    more recent date) — the Pareto frontier query. Spark side is the
    O(n log n) sort-scan via the two-phase distributed prefix-max
    (operators/skyline.py + operators/prefix.py), NOT the quadratic
    NOT-EXISTS self-join; the oracle states the same scan with a
    plain window (fine at oracle scale, one task)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    pts = o.withColumn(
        "_epoch",
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))
        ).cast("long"),
    )
    return skyline_2d(pts, "o_totalprice", "_epoch").drop("_epoch").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )


@register(
    "co_purchase_triangles",
    sql="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) * 1000000000 + node AS ord
      FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
      GROUP BY node
    ),
    oriented AS (
      SELECT CASE WHEN du.ord < dv.ord THEN e.u ELSE e.v END AS src,
             CASE WHEN du.ord < dv.ord THEN e.v ELSE e.u END AS dst,
             CASE WHEN du.ord < dv.ord THEN dv.ord ELSE du.ord END AS dst_ord
      FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
    ),
    wedges AS (
      SELECT e1.dst AS wv, e2.dst AS ww
      FROM oriented e1 JOIN oriented e2
        ON e1.src = e2.src AND e1.dst_ord < e2.dst_ord
    ),
    tri AS (
      SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM wedges w JOIN oriented o ON w.wv = o.src AND w.ww = o.dst
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           n_triangles
    FROM tri
    """,
)
def co_purchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the co-purchase graph (parts appearing in the
    same order are connected). Degree-oriented counting
    (operators/graph.py): wedges only fan out from the
    lower-(degree,id) endpoint, bounding per-node wedge work at
    O(sqrt(edges)) — the standard trick that keeps triangle joins
    alive on skewed graphs. All equi-joins; degree table broadcasts."""
    return triangle_count(_co_purchase_edges(spark, sf_dir))


@register(
    "time_weighted_avg",
    sql="""
    WITH stepped AS (
      SELECT user_id,
             CAST(value AS DECIMAL(18,6)) AS v,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               - epoch_us(ts) AS dt_us
      FROM events
    )
    SELECT user_id,
           floor((CAST(sum(v * dt_us) AS DOUBLE) / CAST(sum(dt_us) AS DOUBLE))
                 * 10000 + 0.5) / 10000.0 AS twap,
           CAST(count(*) AS BIGINT) AS n_intervals
    FROM stepped WHERE dt_us IS NOT NULL
    GROUP BY user_id
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each event's value is held until
    the user's next event; the mean weights each value by its holding
    duration — the correct aggregate for irregularly-sampled series
    (a plain avg over-weights bursts). Durations are exact
    microsecond integers (unix_micros / epoch_us) and the numerator
    is an exact DECIMAL sum, so both engines divide bit-identical
    values. One shuffle on user_id serves the lead() and the
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    stepped = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
        (F.lead(us).over(w) - us).alias("dt_us"),
    ).where(F.col("dt_us").isNotNull())
    return stepped.groupBy("user_id").agg(
        (
            F.floor(
                (
                    F.sum(F.col("v") * F.col("dt_us")).cast("double")
                    / F.sum("dt_us").cast("double")
                )
                * 10000
                + 0.5
            )
            / F.lit(10000.0)
        ).alias("twap"),
        F.count("*").alias("n_intervals"),
    )


@register(
    "cohort_retention",
    sql="""
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    cohorts AS (
      SELECT user_id, min(day) AS cohort_day FROM user_days GROUP BY 1
    ),
    sizes AS (
      SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
      FROM cohorts GROUP BY 1
    )
    SELECT c.cohort_day,
           CAST(u.day - c.cohort_day AS BIGINT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_active,
           any_value(s.cohort_size) AS cohort_size
    FROM user_days u
    JOIN cohorts c ON u.user_id = c.user_id
    JOIN sizes s ON c.cohort_day = s.cohort_day
    GROUP BY c.cohort_day, u.day - c.cohort_day
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day,
    counted again at each day offset — the standard product-analytics
    rollup. Pure integer outputs (no rate division) keep the oracle
    exact. The cohort and size tables are user- and day-sized
    dimensions (broadcastable); the only big shuffle is the distinct
    over (user, day), which partial-aggregates map-side."""
    ev = load_table(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    cohorts = user_days.groupBy("user_id").agg(
        F.min("day").alias("cohort_day")
    )
    sizes = cohorts.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        user_days.join(cohorts, on="user_id")
        .join(F.broadcast(sizes), on="cohort_day")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("bigint").alias("day_offset"),
        )
        .agg(
            F.count("*").alias("n_active"),
            F.any_value("cohort_size").alias("cohort_size"),
        )
    )


@register(
    "dq_constraint_report",
    sql="""
    WITH m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(o_custkey) AS BIGINT) AS n_custkey,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_ok,
             min(o_totalprice) AS min_price,
             max(o_totalprice) AS max_price,
             CAST(count_if(o_orderstatus IN ('O','F','P')) AS BIGINT) AS n_status
      FROM orders
    ),
    ri AS (
      SELECT CAST(count(*) AS BIGINT) AS n_orphans
      FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    )
    SELECT 'completeness_custkey' AS constraint_name,
           floor(CAST(n_custkey AS DOUBLE) / n_rows * 1000000 + 0.5) / 1000000.0 AS metric,
           n_custkey = n_rows AS passed FROM m
    UNION ALL
    SELECT 'uniqueness_orderkey',
           floor(CAST(n_ok AS DOUBLE) / n_rows * 1000000 + 0.5) / 1000000.0,
           n_ok = n_rows FROM m
    UNION ALL
    SELECT 'min_totalprice_nonnegative', min_price, min_price >= 0 FROM m
    UNION ALL
    SELECT 'max_totalprice_bounded', max_price, max_price <= 1000000 FROM m
    UNION ALL
    SELECT 'allowed_values_orderstatus',
           floor(CAST(n_status AS DOUBLE) / n_rows * 1000000 + 0.5) / 1000000.0,
           n_status = n_rows FROM m
    UNION ALL
    SELECT 'referential_custkey_in_customer',
           floor(CAST(n_orphans AS DOUBLE) / (SELECT n_rows FROM m) * 1000000 + 0.5) / 1000000.0,
           n_orphans = 0 FROM ri
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint suite (the Deequ pattern): declare
    completeness / uniqueness / range / allowed-values / referential
    constraints, compute ALL metrics in one pass over the table (a
    single hash aggregate) plus one anti-join for the foreign-key
    check, and emit a (constraint, metric, passed) report. At scale
    this shape matters: N constraints cost one scan, not N scans."""
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    m = o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        F.countDistinct("o_orderkey").alias("n_ok"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.count_if(
            F.col("o_orderstatus").isin("O", "F", "P")
        ).alias("n_status"),
    )
    orphans = (
        o.join(
            cust, on=F.col("o_custkey") == F.col("c_custkey"), how="left_anti"
        )
        .agg(F.count("*").alias("n_orphans"))
    )
    row = m.crossJoin(orphans)

    def q6(c):
        return F.floor(c * 1000000 + 0.5) / F.lit(1000000.0)

    def frac(num):
        return q6(F.col(num).cast("double") / F.col("n_rows"))

    checks = [
        ("completeness_custkey", frac("n_custkey"), F.col("n_custkey") == F.col("n_rows")),
        ("uniqueness_orderkey", frac("n_ok"), F.col("n_ok") == F.col("n_rows")),
        ("min_totalprice_nonnegative", F.col("min_price"), F.col("min_price") >= 0),
        ("max_totalprice_bounded", F.col("max_price"), F.col("max_price") <= 1000000),
        ("allowed_values_orderstatus", frac("n_status"), F.col("n_status") == F.col("n_rows")),
        ("referential_custkey_in_customer", frac("n_orphans"), F.col("n_orphans") == 0),
    ]
    report = None
    for name, metric, passed in checks:
        part = row.select(
            F.lit(name).alias("constraint_name"),
            metric.cast("double").alias("metric"),
            passed.alias("passed"),
        )
        report = part if report is None else report.unionAll(part)
    return report


def _co_purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct co-purchase edges (u < v): parts appearing in the same
    order. Basket-explode build — ONE groupBy on the order key, each
    basket's sorted part set expanded to its pairs map-side — instead
    of the lineitem self-join (which shuffles the fact table twice and
    re-joins it). Identical edge set; per-basket pair expansion is
    quadratic only in BASKET size (orders hold a handful of parts at
    any SF — the co-purchase notion itself caps it), so the explode
    stays linear in lineitem rows at 100 TB. A retail-scale variant
    with giant baskets would cap/sample baskets first."""
    from zoom_spark.io import spread_scan

    # The partial collect_set fold otherwise runs inside the scan task
    # (single-row-group fixture => one task); no-op on a parallel scan.
    grp = (
        spread_scan(
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_partkey"
            )
        )
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
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


def _pagerank_oracle_sql(iterations: int = 10) -> str:
    """Unrolled power-method oracle: 10 fixed iterations as chained
    MATERIALIZED CTEs (DuckDB inlines plain CTEs, and each round
    references the previous one 2-3x — materialization keeps the plan
    linear instead of 3^10 scans). The engine quantizes every
    iteration's ranks to the 9dp grid (pagerank(quantize_dp=9)), and
    this SQL replays the identical floor(x*1e9+0.5) schedule, so both
    engines feed bit-identical ranks into every round and summation-
    order drift (~1e-17) can never reach the 6dp output grid."""
    parts = [
        """li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    eu AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    directed AS MATERIALIZED (
      SELECT u AS f, v AS t FROM eu UNION ALL SELECT v AS f, u AS t FROM eu
    ),
    outdeg AS MATERIALIZED (SELECT f, count(*) AS d FROM directed GROUP BY f),
    nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM outdeg),
    r0 AS MATERIALIZED (
      SELECT f AS node, 1.0 / (SELECT n FROM nn) AS rank FROM outdeg
    )"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""r{i} AS MATERIALIZED (
      SELECT d.t AS node,
             floor(((1.0 - 0.85) / (SELECT n FROM nn)
                    + 0.85 * sum(r.rank / o.d)) * 1000000000.0 + 0.5)
               / 1000000000.0 AS rank
      FROM directed d
      JOIN r{i-1} r ON d.f = r.node
      JOIN outdeg o ON o.f = d.f
      GROUP BY d.t
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT node AS part_id,
           floor(rank * 1000000 + 0.5) / 1000000.0 AS rank_q6
    FROM r{iterations}
    ORDER BY rank DESC, node
    LIMIT 20"""
    )


@register("pagerank_parts", sql=_pagerank_oracle_sql())
def pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the co-purchase graph (operators/graph.pagerank,
    10 fixed power iterations, damping 0.85): the 'importance' signal
    for catalog/curation ranking. Top-20 by rank with node-id
    tie-break. Oracle-hashed since round 7: the fixed iteration count
    makes the fixpoint SQL-expressible as unrolled chained CTEs, with
    a shared 9dp per-iteration quantization schedule keeping both
    engines bit-identical (a numpy power-iteration referee pins the
    unquantized operator in pytest)."""
    from zoom_spark.operators.graph import pagerank

    edges = _co_purchase_edges(spark, sf_dir)
    ranks = pagerank(edges, quantize_dp=9)
    return (
        ranks.orderBy(F.col("rank").desc(), "node")
        .limit(20)
        .select(
            F.col("node").alias("part_id"),
            (F.floor(F.col("rank") * 1000000 + 0.5) / F.lit(1000000.0)).alias(
                "rank_q6"
            ),
        )
    )


@register(
    "markov_transitions",
    sql="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    ),
    t AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n_transitions
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_transitions,
           floor(CAST(n_transitions AS DOUBLE)
                 / sum(n_transitions) OVER (PARTITION BY from_type)
                 * 1000000 + 0.5) / 1000000.0 AS prob
    FROM t
    """,
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    stream (the behavioral-model / anomaly-baseline building block):
    lead() pairs each event with its successor, a hash aggregate
    counts (from, to), and row-normalization is a window over the
    25-cell result — the normalize step costs nothing because the
    matrix is event-type-sized, not data-sized."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    total = Window.partitionBy("from_type")
    prob = F.col("n_transitions").cast("double") / F.sum(
        "n_transitions"
    ).over(total)
    return t.select(
        "from_type",
        "to_type",
        "n_transitions",
        (F.floor(prob * 1000000 + 0.5) / F.lit(1000000.0)).alias("prob"),
    )


@register(
    "welch_ttest_weekend",
    sql="""
    WITH labeled AS (
      SELECT CAST(value AS DECIMAL(18,6)) AS v,
             ((CAST(ts AS DATE) - DATE '2024-01-01') % 7) IN (5, 6) AS wk
      FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT CAST(count_if(wk) AS BIGINT) AS n1,
             CAST(count_if(NOT wk) AS BIGINT) AS n2,
             sum(CASE WHEN wk THEN v END) AS s1,
             sum(CASE WHEN NOT wk THEN v END) AS s2,
             sum(CASE WHEN wk THEN v * v END) AS ss1,
             sum(CASE WHEN NOT wk THEN v * v END) AS ss2
      FROM labeled
    ),
    d AS (
      SELECT n1, n2,
             CAST(s1 AS DOUBLE) / n1 AS m1, CAST(s2 AS DOUBLE) / n2 AS m2,
             (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
               / (n1 - 1) AS v1,
             (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
               / (n2 - 1) AS v2
      FROM m
    )
    SELECT n1 AS n_weekend, n2 AS n_weekday,
           floor((m1 - m2) * 1000000 + 0.5) / 1000000.0 AS mean_diff,
           floor((m1 - m2) / sqrt(v1 / n1 + v2 / n2) * 1000000 + 0.5)
             / 1000000.0 AS t_stat,
           floor((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1))
                 * 10000 + 0.5) / 10000.0 AS welch_df
    FROM d
    """,
)
def welch_ttest_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test statistic at warehouse scale: Welch's unequal-variance
    t between weekend and weekday purchase values, computed from ONE
    pass of conditional exact-decimal moments (no per-group subquery,
    no second scan). Weekend test uses day-offset-mod-7 arithmetic so
    both engines share the same integer expression (dayofweek numbering
    differs between dialects). All double math happens once, on exact
    inputs, in identical expression order."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    vdec = F.col("value").cast("decimal(18,6)")
    wk = (
        F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01"))) % 7
    ).isin(5, 6)
    m = ev.select(vdec.alias("v"), wk.alias("wk")).agg(
        F.count_if("wk").alias("n1"),
        F.count_if(~F.col("wk")).alias("n2"),
        F.sum(F.when(F.col("wk"), F.col("v"))).alias("s1"),
        F.sum(F.when(~F.col("wk"), F.col("v"))).alias("s2"),
        F.sum(F.when(F.col("wk"), F.col("v") * F.col("v"))).alias("ss1"),
        F.sum(F.when(~F.col("wk"), F.col("v") * F.col("v"))).alias("ss2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    m1 = F.col("s1").cast("double") / n1
    m2 = F.col("s2").cast("double") / n2
    v1 = (
        F.col("ss1").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / n1
    ) / (n1 - 1)
    v2 = (
        F.col("ss2").cast("double")
        - F.col("s2").cast("double") * F.col("s2").cast("double") / n2
    ) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / F.sqrt(se2)
    wdf = (se2 * se2) / (
        (v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1)
    )

    def q(c, scale):
        return F.floor(c * scale + 0.5) / F.lit(float(scale))

    return m.select(
        n1.alias("n_weekend"),
        n2.alias("n_weekday"),
        q(m1 - m2, 1000000).alias("mean_diff"),
        q(t, 1000000).alias("t_stat"),
        q(wdf, 10000).alias("welch_df"),
    )


@register(
    "equidepth_histogram",
    sql="""
    WITH ranked AS (
      SELECT o_totalprice,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn
      FROM orders
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS c FROM orders),
    b AS (
      SELECT o_totalprice,
             CASE WHEN rn <= (c % 10) * (c // 10 + 1)
                  THEN (rn - 1) // (c // 10 + 1) + 1
                  ELSE (c % 10)
                       + (rn - 1 - (c % 10) * (c // 10 + 1)) // (c // 10) + 1
             END AS bucket
      FROM ranked, tot
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi
    FROM b GROUP BY bucket
    """,
)
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-height) 10-bucket histogram of order prices —
    the optimizer-statistics primitive. The global rank comes from
    operators/prefix.global_row_number (range partition + local
    row_number + O(P) offsets), NOT a single-task ntile window; the
    NTILE bucket formula is then applied arithmetically so the oracle
    (plain row_number + the same formula) states identical semantics.
    A 1-row count scalar broadcasts into the bucket expression."""
    from zoom_spark.operators.prefix import global_row_number

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    ranked = global_row_number(o, ["o_totalprice", "o_orderkey"])
    tot = o.agg(F.count("*").cast("bigint").alias("c"))
    k = 10
    rn, c = F.col("rn"), F.col("c")
    # double division + truncating cast == floor for these positive
    # ranges (exact below 2^53)
    size = (c / k).cast("bigint")
    # NTILE semantics: the first c%k buckets hold size+1 rows
    cut = (c % k) * (size + 1)
    bucket = F.when(
        rn <= cut, ((rn - 1) / (size + 1)).cast("bigint") + 1
    ).otherwise((c % k) + ((rn - 1 - cut) / size).cast("bigint") + 1)
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select("o_totalprice", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "posting_lists",
    sql=r"""
    WITH term_rows AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ),
    postings AS (
      SELECT term,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
             array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS posting_list
      FROM term_rows GROUP BY term
    )
    SELECT term, doc_freq, posting_list
    FROM postings
    ORDER BY doc_freq DESC, term
    LIMIT 40
    """,
)
def posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (the search-engine core op): token explode
    -> per-term sorted posting list + document frequency, top-40 terms
    by df with term tie-break. Postings are numerically sorted doc-id
    arrays serialized AFTER sorting, so both engines emit byte-equal
    lists. One shuffle on term; collect_set keeps the posting
    map-side-combinable."""
    from zoom_spark.queries.corpus_stats import _term_rows

    docs = load_table(spark, sf_dir, "documents")
    return (
        _term_rows(docs)
        .groupBy("term")
        .agg(
            F.count_distinct("doc_id").alias("doc_freq"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_set("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("posting_list"),
        )
        .orderBy(F.col("doc_freq").desc(), "term")
        .limit(40)
    )


@register("cdc_chunks_docs")
def cdc_chunks_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (gear-hash CDC) of the documents table
    — rows-only gate (the sequential rolling hash is not
    SQL-expressible); reconstruction / bounds / edit-locality
    properties are pytest-gated in test_advanced_analytics.py."""
    docs = load_table(spark, sf_dir, "documents")
    return cdc_chunks(docs).orderBy("doc_id", "chunk_idx")


def _lpa_oracle_sql(rounds: int = 5) -> str:
    """Unrolled synchronous label-propagation oracle: per round, each
    node adopts the most frequent neighbor label (ties -> smallest
    label — row_number ordered by votes DESC, label ASC replicates the
    engine's max_by((votes, -community)) exactly); integer labels and
    counts end-to-end, so the replay is exact."""
    head = """li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    eu AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    sym AS MATERIALIZED (
      SELECT u AS a, v AS b FROM eu UNION ALL SELECT v AS a, u AS b FROM eu
    ),
    l0 AS MATERIALIZED (
      SELECT DISTINCT a AS node, a AS community FROM sym
    )"""
    parts = [head]
    for k in range(1, rounds + 1):
        parts.append(
            f"""v{k} AS MATERIALIZED (
      SELECT s.a, l.community, count(*) AS n_votes
      FROM sym s JOIN l{k-1} l ON l.node = s.b
      GROUP BY s.a, l.community
    ),
    l{k} AS MATERIALIZED (
      SELECT a AS node, community FROM (
        SELECT a, community,
               row_number() OVER (PARTITION BY a
                                  ORDER BY n_votes DESC, community ASC)
                 AS rn
        FROM v{k}
      ) WHERE rn = 1
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT community, CAST(count(*) AS BIGINT) AS n_nodes
    FROM l{rounds} GROUP BY community"""
    )


@register("community_labels_copurchase", sql=_lpa_oracle_sql())
def community_labels_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities on the co-purchase graph
    (operators/graph.label_propagation_communities): dense purchase
    regions coalesce onto one label while bridge edges can't outvote
    a community's internal majority — the CC output can't make this
    distinction (everything co-purchased is one component). Output
    is the per-community size histogram (community, n_nodes), the
    artifact a segmentation job reports. Oracle-hashed since round 7:
    the 5 fixed synchronous rounds are integer-deterministic
    (most-frequent neighbor label, ties to the smallest), so an
    unrolled SQL replay reproduces them exactly; the planted-clique
    properties in tests/test_advanced_analytics.py stay as the
    semantic gate."""
    from zoom_spark.operators.graph import label_propagation_communities

    edges = _co_purchase_edges(spark, sf_dir)
    labels = label_propagation_communities(edges)
    return labels.groupBy("community").agg(F.count("*").alias("n_nodes"))


def _hits_oracle_sql(iters: int = 8) -> str:
    """Unrolled mutual-power-method replay (pagerank schedule): both
    score vectors snapped to the 9dp grid after every L2-normalized
    half-step, so each round restarts from bit-identical values and
    summation-order drift can never accumulate across rounds."""
    head = """e AS MATERIALIZED (
      SELECT DISTINCT l_suppkey AS hub, l_partkey AS auth FROM lineitem
    ),
    a0 AS MATERIALIZED (
      SELECT DISTINCT auth AS node, 1.0 AS a FROM e
    )"""
    parts = [head]
    for i in range(1, iters + 1):
        parts.append(
            f"""hr{i} AS MATERIALIZED (
      SELECT e.hub, sum(p.a) AS h FROM e JOIN a{i-1} p ON p.node = e.auth
      GROUP BY e.hub
    ),
    h{i} AS MATERIALIZED (
      SELECT hub AS node,
             floor(h / (SELECT sqrt(sum(h * h)) FROM hr{i}) * 1e9 + 0.5)
               / 1e9 AS h
      FROM hr{i}
    ),
    ar{i} AS MATERIALIZED (
      SELECT e.auth, sum(p.h) AS a FROM e JOIN h{i} p ON p.node = e.hub
      GROUP BY e.auth
    ),
    a{i} AS MATERIALIZED (
      SELECT auth AS node,
             floor(a / (SELECT sqrt(sum(a * a)) FROM ar{i}) * 1e9 + 0.5)
               / 1e9 AS a
      FROM ar{i}
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f""",
    th AS (SELECT 'hub' AS side, node AS node_id,
                  floor(h * 1e6 + 0.5) / 1e6 AS score_q6
           FROM h{iters} ORDER BY h DESC, node LIMIT 12),
    ta AS (SELECT 'auth' AS side, node AS node_id,
                  floor(a * 1e6 + 0.5) / 1e6 AS score_q6
           FROM a{iters} ORDER BY a DESC, node LIMIT 12)
    SELECT * FROM th UNION ALL SELECT * FROM ta"""
    )


@register("hits_supplier_part", sql=_hits_oracle_sql())
def hits_supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R195 HITS hubs & authorities over the supplier->part supply
    graph (distinct l_suppkey -> l_partkey edges): suppliers are hubs
    (they stock influential parts), parts are authorities (stocked by
    influential suppliers) — the classic bipartite importance dual
    complementing pagerank_parts. operators/graph.hits: 8 mutual
    power iterations, one equi-join + one aggregate per half-step,
    1-row broadcast L2 normalizers, lazy checkpoints. Oracle-hashed
    since round 8 via the unrolled-CTE replay with 9dp half-step
    snapping (quantize_dp=9 — the pagerank schedule); the numpy
    power-iteration referee in tests stays as the independent check.
    Output: top-12 per side with id tie-break."""
    from zoom_spark.operators.graph import hits

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("hub"), F.col("l_partkey").alias("auth")
    ).distinct()
    hubs, auths = hits(edges, quantize_dp=9)
    top_h = (
        hubs.orderBy(F.col("h").desc(), "node")
        .limit(12)
        .select(
            F.lit("hub").alias("side"),
            F.col("node").alias("node_id"),
            (F.floor(F.col("h") * 1000000 + 0.5) / F.lit(1000000.0)).alias(
                "score_q6"
            ),
        )
    )
    top_a = (
        auths.orderBy(F.col("a").desc(), "node")
        .limit(12)
        .select(
            F.lit("auth").alias("side"),
            F.col("node").alias("node_id"),
            (F.floor(F.col("a") * 1000000 + 0.5) / F.lit(1000000.0)).alias(
                "score_q6"
            ),
        )
    )
    return top_h.unionAll(top_a)


@register(
    "local_clustering_parts",
    sql="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg,
             CAST(count(*) AS BIGINT) * 1000000000 + node AS ord
      FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
      GROUP BY node
    ),
    oriented AS (
      SELECT CASE WHEN du.ord < dv.ord THEN e.u ELSE e.v END AS src,
             CASE WHEN du.ord < dv.ord THEN e.v ELSE e.u END AS dst,
             CASE WHEN du.ord < dv.ord THEN dv.ord ELSE du.ord END AS dst_ord
      FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
    ),
    found AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM oriented e1
      JOIN oriented e2 ON e1.src = e2.src AND e1.dst_ord < e2.dst_ord
      JOIN oriented o ON o.src = e1.dst AND o.dst = e2.dst
    ),
    tri AS (
      SELECT node, CAST(count(*) AS BIGINT) AS tri
      FROM (SELECT a AS node FROM found
            UNION ALL SELECT b FROM found
            UNION ALL SELECT c FROM found)
      GROUP BY node
    )
    SELECT deg.node, deg.deg, COALESCE(tri.tri, 0) AS tri,
           round(2.0 * COALESCE(tri.tri, 0)
                 / (deg.deg * (deg.deg - 1)), 6) AS lcc
    FROM deg LEFT JOIN tri ON deg.node = tri.node
    WHERE deg.deg >= 2
    """,
)
def local_clustering_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part local clustering coefficient on the co-purchase graph
    (operators/graph.py local_clustering): degree-oriented wedge
    enumeration finds each triangle once, then explodes it onto its
    three vertices for exact per-node counts — the node-level
    refinement of co_purchase_triangles, and the standard
    "how clique-like is this node's neighborhood" curation signal."""
    from zoom_spark.operators.graph import local_clustering

    return local_clustering(_co_purchase_edges(spark, sf_dir))


def _ktruss_oracle_sql(rounds: int = 12, k: int = 4) -> str:
    """Unrolled truss-peeling replay: each round re-enumerates
    triangles of the surviving edge set via the same degree-oriented
    wedge join the engine's ONE-TIME enumeration uses, counts per-edge
    support, and drops edges below k-2. Peeling is monotone (the edge
    set only shrinks), so extra rounds past the fixpoint are no-ops
    and a convergence sentinel (edge counts of the last two rounds)
    makes under-unrolling fail LOUDLY at any SF. All-integer
    arithmetic — no float grid anywhere."""
    head = """li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )"""
    parts = [head]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"""deg{p} AS MATERIALIZED (
      SELECT node, count(*) * 1000000000 + node AS ord
      FROM (SELECT u AS node FROM e{p} UNION ALL SELECT v AS node FROM e{p})
      GROUP BY node
    ),
    o{p} AS MATERIALIZED (
      SELECT CASE WHEN du.ord < dv.ord THEN e.u ELSE e.v END AS src,
             CASE WHEN du.ord < dv.ord THEN e.v ELSE e.u END AS dst,
             CASE WHEN du.ord < dv.ord THEN dv.ord ELSE du.ord END AS dst_ord
      FROM e{p} e JOIN deg{p} du ON e.u = du.node
                  JOIN deg{p} dv ON e.v = dv.node
    ),
    t{p} AS MATERIALIZED (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM o{p} e1
      JOIN o{p} e2 ON e1.src = e2.src AND e1.dst_ord < e2.dst_ord
      JOIN o{p} cl ON cl.src = e1.dst AND cl.dst = e2.dst
    ),
    s{p} AS MATERIALIZED (
      SELECT u, v, CAST(count(*) AS BIGINT) AS support
      FROM (
        SELECT least(a, b) AS u, greatest(a, b) AS v FROM t{p}
        UNION ALL SELECT least(a, c), greatest(a, c) FROM t{p}
        UNION ALL SELECT least(b, c), greatest(b, c) FROM t{p}
      ) GROUP BY u, v
    ),
    e{i} AS MATERIALIZED (
      SELECT s.u, s.v, s.support FROM s{p} s WHERE s.support >= {k - 2}
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT u, v, support FROM e{rounds}
    UNION ALL
    -- convergence sentinel: monotone peel, equal edge counts in the
    -- last two rounds == fixpoint reached inside the unroll depth
    SELECT -1 AS u, -1 AS v, CAST(-1 AS BIGINT) AS support
    WHERE (SELECT count(*) FROM e{rounds})
       <> (SELECT count(*) FROM e{rounds - 1})"""
    )


@register("k_truss_copurchase", sql=_ktruss_oracle_sql())
def k_truss_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-truss of the co-purchase graph (operators/graph.k_truss):
    iteratively delete edges supported by < 2 triangles to fixpoint —
    the dense-core extraction that survives spurious co-occurrence
    links, refining co_purchase_triangles (global count) and
    local_clustering_parts (per-node) down to the edge level. ONE
    bounded wedge-join triangle enumeration, then incremental support
    maintenance per peel round (deleted edges ⋈ live triangles — the
    affected neighborhood, not the graph). Oracle-hashed since round
    8: all-integer peel, so the unrolled per-round re-enumeration
    replay (with a convergence sentinel) matches the engine's
    incremental path exactly; the pure-Python peeling referee stays
    as the independent check."""
    from zoom_spark.operators.graph import k_truss

    return k_truss(
        _co_purchase_edges(spark, sf_dir), k=4, assume_deduped=True
    ).orderBy("u", "v")

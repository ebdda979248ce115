"""Round-10 operator additions (R345+, SURVEY.md §2.19).

Families, chosen to fill the change-point / errors-in-variables /
multi-rater-agreement / distribution-distance / spatial-autocorrelation
gaps left after rounds 2-9 (concept-grepped against the registry
first — the round-7 lesson; pettitt/deming/page/fleiss/krippendorff/
quade/breusch-pagan/chow/hellinger/kendall-W/moran/CCF/dunn/dixon/
siegel-tukey/hosmer-lemeshow/katz had no existing implementations):

- change-point & structural breaks: Pettitt test, Chow test
- errors-in-variables: Deming regression (delta = 1)
- ordered/blocked rank tests: Page's trend, Quade, Siegel-Tukey
- multi-rater agreement: Fleiss' kappa, Krippendorff's alpha,
  Kendall's W
- distribution distances: Hellinger / Bhattacharyya / total variation
- heteroscedasticity: Breusch-Pagan LM
- graph: Moran's I over the co-purchase graph, Katz centrality
- time series: cross-correlation function (orders vs revenue)
- clustering validity: Dunn index over the gated int-Lloyd cells
- calibration: Hosmer-Lemeshow over an empirical-rate model
- outliers: Dixon's Q

Engine-parity discipline (shared with rounds 4-9): integer-exact
arithmetic wherever inputs quantize once (cent/dollar grids, rank 0.5
grids, sign sums); raw INTEGER moments kept in BIGINT and cast to
double only at the closed form (identical cast -> identical doubles);
transcendental inputs are exact-operand doubles; outputs snapped with
the shared floor(x*1e6+0.5) spelling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.queries import register


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, t, cents): calendar-day order revenue on the exact cent
    grid (per-price round-half-up, then exact long sums) with a
    1-based day index t in day order — the shared series frame for the
    round-10 time-series statistics."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.orderBy("day")
    return daily.withColumn("t", F.row_number().over(w).cast("long"))


_DAILY_CENTS_SQL = """
    daily AS MATERIALIZED (
      SELECT day, t, cents FROM (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
      ) d
      CROSS JOIN LATERAL (SELECT 1) dummy(one)
      WINDOW dummy_w AS (ORDER BY day)
    )
"""


# ---------------------------------------------------------------------------
# R345 Pettitt change-point test on daily revenue
# ---------------------------------------------------------------------------


@register(
    "pettitt_daily_revenue",
    sql="""
    WITH d AS MATERIALIZED (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    idx AS MATERIALIZED (
      SELECT day, cents,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      FROM d
    ),
    -- difference array: pair (i < j) adds sign(x_i - x_j) to every
    -- U_t with i <= t < j; cumulative-summing (add - sub) yields U_t
    deltas AS MATERIALIZED (
      SELECT a.t AS ti, b.t AS tj,
             CAST(CASE WHEN a.cents > b.cents THEN 1
                       WHEN a.cents < b.cents THEN -1 ELSE 0 END
                  AS BIGINT) AS s
      FROM idx a JOIN idx b ON a.t < b.t
    ),
    adds AS (
      SELECT ti AS t, CAST(sum(s) AS BIGINT) AS v FROM deltas GROUP BY ti
    ),
    subs AS (
      SELECT tj AS t, CAST(sum(s) AS BIGINT) AS v FROM deltas GROUP BY tj
    ),
    u AS (
      SELECT i.t, i.day,
             sum(COALESCE(a.v, 0) - COALESCE(s.v, 0)) OVER (
               ORDER BY i.t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS ut
      FROM idx i
      LEFT JOIN adds a ON a.t = i.t
      LEFT JOIN subs s ON s.t = i.t
    ),
    best AS (
      SELECT t, day, abs(ut) AS k FROM u
      WHERE t < (SELECT max(t) FROM idx)
      ORDER BY abs(ut) DESC, day LIMIT 1
    )
    SELECT (SELECT CAST(max(t) AS BIGINT) FROM idx) AS n_days,
           CAST(best.k AS BIGINT) AS k_stat,
           best.day AS change_day,
           round(2 * exp(-6.0 * best.k * best.k /
                 (power(CAST((SELECT max(t) FROM idx) AS DOUBLE), 3)
                  + power(CAST((SELECT max(t) FROM idx) AS DOUBLE), 2))), 6)
             AS p_approx
    FROM best
    """,
)
def pettitt_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R345 Pettitt (1979) nonparametric change-point test on daily
    revenue: U_t = sum over (i <= t < j) of sign(x_i - x_j); the
    change point is argmax |U_t| and the approximate significance is
    2*exp(-6K^2/(T^3+T^2)).  The O(T^2) pairwise sign sum is computed
    as a DIFFERENCE ARRAY (pair (i,j) contributes to a range of t) so
    the per-t statistic is one cumulative window over T rows — the
    pair join is calendar-bounded (T~2400 days at sf0.1, ~2.9M sign
    pairs; the day count does not grow with row volume).  Cents are
    exact longs, so every sign, sum and |U| is integer-exact; the only
    float is the final exp of exact-operand arguments."""
    d = _daily_cents(spark, sf_dir)
    a = d.select(F.col("t").alias("ti"), F.col("cents").alias("xa"))
    b = d.select(F.col("t").alias("tj"), F.col("cents").alias("xb"))
    s = F.when(F.col("xa") > F.col("xb"), 1).when(
        F.col("xa") < F.col("xb"), -1
    ).otherwise(0).cast("long")
    deltas = (
        a.join(b, F.col("ti") < F.col("tj"))
        .select("ti", "tj", s.alias("s"))
        .localCheckpoint(eager=False)
    )
    adds = deltas.groupBy(F.col("ti").alias("t")).agg(
        F.sum("s").cast("long").alias("av")
    )
    subs = deltas.groupBy(F.col("tj").alias("t")).agg(
        F.sum("s").cast("long").alias("sv")
    )
    u = (
        d.join(adds, on="t", how="left")
        .join(subs, on="t", how="left")
        .select(
            "t",
            "day",
            (
                F.coalesce(F.col("av"), F.lit(0))
                - F.coalesce(F.col("sv"), F.lit(0))
            ).alias("dv"),
        )
        .withColumn(
            "ut",
            F.sum("dv").over(
                Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    n = d.agg(F.max("t").cast("long").alias("n_days"))
    best = (
        u.join(F.broadcast(n))
        .where(F.col("t") < F.col("n_days"))
        .orderBy(F.abs(F.col("ut")).desc(), "day")
        .limit(1)
    )
    tt = F.col("n_days").cast("double")
    return best.select(
        "n_days",
        F.abs(F.col("ut")).cast("long").alias("k_stat"),
        F.col("day").alias("change_day"),
        F.round(
            2
            * F.exp(
                -6.0
                * F.abs(F.col("ut"))
                * F.abs(F.col("ut"))
                / (F.pow(tt, 3) + F.pow(tt, 2))
            ),
            6,
        ).alias("p_approx"),
    )


# ---------------------------------------------------------------------------
# R346 Deming regression (errors-in-variables, delta = 1)
# ---------------------------------------------------------------------------


@register(
    "deming_daily_regression",
    sql="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x,
             CAST(floor(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) / 100) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM d
    )
    SELECT n AS n_days,
           round((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n
                  - (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                  + sqrt(power(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n
                               - (CAST(sxx AS DOUBLE)
                                  - CAST(sx AS DOUBLE) * sx / n), 2)
                         + 4 * power(CAST(sxy AS DOUBLE)
                                     - CAST(sx AS DOUBLE) * sy / n, 2)))
                 / (2 * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)),
                 6) AS slope,
           round(CAST(sy AS DOUBLE) / n
                 - ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n
                     - (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                     + sqrt(power(CAST(syy AS DOUBLE)
                                  - CAST(sy AS DOUBLE) * sy / n
                                  - (CAST(sxx AS DOUBLE)
                                     - CAST(sx AS DOUBLE) * sx / n), 2)
                            + 4 * power(CAST(sxy AS DOUBLE)
                                        - CAST(sx AS DOUBLE) * sy / n, 2)))
                    / (2 * (CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * sy / n)))
                   * (CAST(sx AS DOUBLE) / n), 4) AS intercept
    FROM m
    """,
)
def deming_daily_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R346 Deming regression (errors-in-variables, error-variance
    ratio delta = 1) of daily revenue DOLLARS on daily order count:
    slope = (Syy - Sxx + sqrt((Syy - Sxx)^2 + 4 Sxy^2)) / (2 Sxy) —
    the symmetric fit a measurement-comparison study uses when BOTH
    variables carry noise (OLS, which conditions on x, is already
    gated as ols_daily_revenue-family queries).  Revenue quantizes to
    exact whole DOLLARS (cents are exact longs; the dollar floor keeps
    sum(y^2) ~ 2.4e17 inside BIGINT at sf0.1 and the 10x smoke), all
    raw moments are exact BIGINTs, and the closed form consumes
    identically-cast doubles — bit-deterministic through the correctly
    rounded sqrt.  One hash aggregate to a 1-row moment frame at any
    scale."""
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count("*").cast("long").alias("x"),
            F.floor(
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                        "long"
                    )
                )
                / 100
            )
            .cast("long")
            .alias("y"),
        )
    )
    m = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    nd = F.col("n").cast("double")
    cxx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / nd
    cyy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / nd
    cxy = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / nd
    slope = (cyy - cxx + F.sqrt(F.pow(cyy - cxx, 2) + 4 * F.pow(cxy, 2))) / (
        2 * cxy
    )
    intercept = F.col("sy").cast("double") / nd - slope * (
        F.col("sx").cast("double") / nd
    )
    return m.select(
        F.col("n").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# R347 Page's trend test (ordered alternative across weekdays)
# ---------------------------------------------------------------------------


@register(
    "pages_trend_weekday",
    sql="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST((CAST(o_orderdate AS DATE) - DATE '1990-01-01') // 7
                  AS BIGINT) AS blk,
             CAST((CAST(o_orderdate AS DATE) - DATE '1990-01-01') % 7
                  AS BIGINT) AS dow,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2, 3
    ),
    full_blk AS (
      SELECT blk FROM d GROUP BY blk HAVING count(*) = 7
    ),
    k AS (SELECT d.* FROM d JOIN full_blk USING (blk)),
    r AS (   -- within-block average ranks from the 7x7 self-join
      SELECT a.blk, a.dow,
             sum(CASE WHEN b.cents < a.cents THEN 1.0
                      WHEN b.cents = a.cents THEN 0.5 ELSE 0 END) + 0.5
               AS rnk
      FROM k a JOIN k b ON a.blk = b.blk
      GROUP BY a.blk, a.dow
    ),
    rs AS (
      SELECT dow, sum(rnk) AS rj FROM r GROUP BY dow
    ),
    agg AS (
      SELECT CAST((SELECT count(*) FROM full_blk) AS BIGINT) AS m,
             sum((dow + 1) * rj) AS l
      FROM rs
    )
    SELECT m AS n_blocks, round(l, 1) AS l_stat,
           round((12 * l - 3.0 * m * 7 * (7 + 1) * (7 + 1))
                 / (7.0 * (7 + 1) * sqrt(CAST(m AS DOUBLE) * 7 * (7 - 1))),
                 6) AS z
    FROM agg
    """,
)
def pages_trend_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R347 Page's trend test (Page 1963) for an ORDERED alternative
    across the 7 weekdays, blocked by calendar week: L = sum_j j * R_j
    where R_j is the rank sum of weekday j across complete weeks —
    the monotone-trend-sensitive twin of the gated Friedman test
    (which only detects ANY treatment difference).  Within-block
    average ranks come from the 7x7 self-join (block-bounded, never a
    data window); ranks live on the exact 0.5 grid over exact cents,
    so L is grid-exact and the z approximation consumes exact-operand
    doubles.  Weekday index uses the 1990-01-01 Monday anchor (the
    round-8 dayofweek parity rule)."""
    anchor = F.lit("1990-01-01").cast("date")
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderdate").cast("date").alias("day"),
            F.floor(
                F.datediff(F.col("o_orderdate").cast("date"), anchor) / 7
            )
            .cast("long")
            .alias("blk"),
            (
                F.datediff(F.col("o_orderdate").cast("date"), anchor) % 7
            )
            .cast("long")
            .alias("dow"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    full_blk = d.groupBy("blk").count().where(F.col("count") == 7).select("blk")
    k = d.join(full_blk, on="blk")
    a = k.select("blk", "dow", "cents")
    b = k.select(F.col("blk").alias("blk2"), F.col("cents").alias("c2"))
    r = (
        a.join(b, F.col("blk") == F.col("blk2"))
        .groupBy("blk", "dow")
        .agg(
            (
                F.sum(
                    F.when(F.col("c2") < F.col("cents"), 1.0)
                    .when(F.col("c2") == F.col("cents"), 0.5)
                    .otherwise(0.0)
                )
                + 0.5
            ).alias("rnk")
        )
    )
    rs = r.groupBy("dow").agg(F.sum("rnk").alias("rj"))
    m_ = full_blk.agg(F.count("*").cast("long").alias("m"))
    agg = rs.agg(F.sum((F.col("dow") + 1) * F.col("rj")).alias("l")).crossJoin(
        F.broadcast(m_)
    )
    md = F.col("m").cast("double")
    return agg.select(
        F.col("m").alias("n_blocks"),
        F.round(F.col("l"), 1).alias("l_stat"),
        F.round(
            (12 * F.col("l") - 3.0 * F.col("m") * 7 * 8 * 8)
            / (7.0 * 8 * F.sqrt(md * 7 * 6)),
            6,
        ).alias("z"),
    )

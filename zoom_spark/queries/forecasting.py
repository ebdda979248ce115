"""Forecasting operators (R192+): Holt's linear-trend (double
exponential smoothing) forecast over the daily revenue series.

The recursion s_t = α·y_t + (1−α)(s_{t−1}+b_{t−1}) is inherently
sequential, but the SERIES is calendar-bounded: the day-level
pre-aggregate has one row per order date (~2.4k rows at ANY scale
factor), so the sequential pass runs over a constant-sized frame —
the same waiver class as the repo's other calendar-bounded ops
(range_frame_rolling_revenue, cusum_changepoint_revenue). The 100 TB
cost lives in the day pre-aggregate, which is one decomposable
hash aggregate.

Engine-parity discipline: smoothing constants are written as LITERALS
on both engines (0.3/0.7, 0.1/0.9 — never computed as 1−α, which
differs from the 0.7 literal in the last bit), daily revenue is
cent-grid-exact (round(sum, 2)), and the Python loop mirrors the
DuckDB recursive-CTE arithmetic operation for operation, so the
recursion stays bit-identical across engines before the final 4dp
rounding.

No analog in the reference connector (SURVEY.md §2.11 extension
family).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.queries import register

# literals shared by both engines — see module docstring
HOLT_A = 0.3
HOLT_OMA = 0.7
HOLT_B = 0.1
HOLT_OMB = 0.9
HOLT_H = 7


def holt_fit(ys: list[float]) -> tuple[float, float]:
    """Run the Holt recursion over an ordered series; returns the
    final (level, trend). Mirrors the oracle's recursive CTE
    operation for operation (literal constants, same op order)."""
    s = ys[0]
    b = ys[1] - ys[0]
    for t in range(1, len(ys)):
        y = ys[t]
        s_new = HOLT_A * y + HOLT_OMA * (s + b)
        b = HOLT_B * (s_new - s) + HOLT_OMB * b
        s = s_new
    return s, b


@register(
    "holt_linear_forecast_revenue",
    sql=f"""
    WITH RECURSIVE daily AS (
      SELECT o_orderdate AS day, round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t, rev
      FROM daily
    ),
    rec AS (
      SELECT CAST(1 AS BIGINT) AS t,
             (SELECT rev FROM idx WHERE t = 1) AS s,
             (SELECT rev FROM idx WHERE t = 2)
               - (SELECT rev FROM idx WHERE t = 1) AS b
      UNION ALL
      SELECT r.t + 1,
             {HOLT_A} * i.rev + {HOLT_OMA} * (r.s + r.b),
             {HOLT_B} * (({HOLT_A} * i.rev + {HOLT_OMA} * (r.s + r.b)) - r.s)
               + {HOLT_OMB} * r.b
      FROM rec r JOIN idx i ON i.t = r.t + 1
    ),
    fin AS (
      SELECT t AS n_days, s, b FROM rec ORDER BY t DESC LIMIT 1
    )
    SELECT CAST(h.h AS BIGINT) AS h,
           f.n_days,
           round(f.s, 4) AS level,
           round(f.b, 6) AS trend,
           round(f.s + h.h * f.b, 4) AS yhat
    FROM fin f CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS h) h
    """,
)
def holt_linear_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R192 Holt's linear-trend forecast of daily revenue, horizon
    {HOLT_H} days: level/trend double exponential smoothing
    (α=0.3, β=0.1; init s₁=y₁, b₁=y₂−y₁ over the observed-day
    sequence), forecast ŷ_{{n+h}} = s_n + h·b_n. One decomposable
    day-level aggregate feeds an applyInPandas pass over the
    calendar-bounded series (single constant-key group — bounded by
    the calendar, not the data; the oracle recomputes the identical
    recursion with a DuckDB recursive CTE)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        ys = pdf["rev"].tolist()
        n = len(ys)
        if n < 2:
            return pd.DataFrame(
                columns=["h", "n_days", "level", "trend", "yhat"]
            )
        s, b = holt_fit(ys)
        rows = [
            (h, n, s, b, s + h * b) for h in range(1, HOLT_H + 1)
        ]
        return pd.DataFrame(
            rows, columns=["h", "n_days", "level", "trend", "yhat"]
        )

    raw = (
        daily.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            lambda pdf: holt(pdf),
            schema="h bigint, n_days bigint, level double, trend double, yhat double",
        )
    )
    # rounding happens JVM-side (HALF_UP, matching DuckDB round()) —
    # Python's round() is half-even and would diverge on boundaries
    return raw.select(
        "h",
        "n_days",
        F.round("level", 4).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("yhat", 4).alias("yhat"),
    )


# ---------------------------------------------------------------------------
# R205: Durbin-Watson residual autocorrelation diagnostic
# ---------------------------------------------------------------------------


@register(
    "durbin_watson_revenue_trend",
    sql="""
    WITH daily AS (
      SELECT o_orderdate AS day, round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t, rev
      FROM daily
    ),
    fit AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             round((count(*) * sum(t * rev) - sum(t) * sum(rev))
                   / (count(*) * sum(t * t) - sum(t) * sum(t)), 6) AS b
      FROM idx
    ),
    fit2 AS (
      SELECT f.n, f.b,
             round((sum(i.rev) - f.b * sum(i.t)) / f.n, 4) AS a
      FROM idx i CROSS JOIN fit f GROUP BY f.n, f.b
    ),
    resid AS (
      SELECT i.t, i.rev - (f.a + f.b * i.t) AS e
      FROM idx i CROSS JOIN fit2 f
    ),
    lagd AS (
      SELECT e, lag(e) OVER (ORDER BY t) AS e_prev FROM resid
    ),
    dw AS (
      SELECT sum(pow(e - e_prev, 2)) AS num,
             sum(e * e) AS den
      FROM lagd
    )
    SELECT f.n AS n_days, f.b AS slope, f.a AS intercept,
           round(d.num / d.den, 6) AS dw,
           round(1 - (d.num / d.den) / 2, 6) AS rho_approx
    FROM dw d CROSS JOIN fit2 f
    """,
)
def durbin_watson_revenue_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """R205 Durbin-Watson statistic on the residuals of the daily-
    revenue linear trend — the lag-1 autocorrelation diagnostic that
    says whether an OLS trend's standard errors can be trusted
    (DW≈2 - 2ρ). OLS comes from exact cent-grid sums (closed form, no
    iteration), the slope/intercept are ROUNDED before the residual
    pass so both engines subtract identical fits, and the lag runs
    over the calendar-bounded day frame (the cusum-style bounded
    exception). Scale cost is one day-level aggregate."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    w_day = Window.orderBy("day")
    idx = daily.select(
        F.row_number().over(w_day).cast("bigint").alias("t"), "rev"
    ).localCheckpoint(eager=False)
    fit = idx.agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(
            (
                F.count("*") * F.sum(F.col("t") * F.col("rev"))
                - F.sum("t") * F.sum("rev")
            )
            / (
                F.count("*") * F.sum(F.col("t") * F.col("t"))
                - F.sum("t") * F.sum("t")
            ),
            6,
        ).alias("b"),
    )
    fit2 = (
        idx.crossJoin(F.broadcast(fit))
        .groupBy("n", "b")
        .agg(
            F.round(
                (F.sum("rev") - F.col("b") * F.sum("t")) / F.col("n"), 4
            ).alias("a")
        )
    )
    resid = idx.crossJoin(F.broadcast(fit2)).select(
        "t",
        "n",
        "b",
        "a",
        (F.col("rev") - (F.col("a") + F.col("b") * F.col("t"))).alias("e"),
    )
    w_t = Window.orderBy("t")
    dw = resid.withColumn("e_prev", F.lag("e").over(w_t)).agg(
        F.sum(F.pow(F.col("e") - F.col("e_prev"), 2)).alias("num"),
        F.sum(F.col("e") * F.col("e")).alias("den"),
        F.min("n").alias("n_days"),
        F.min("b").alias("slope"),
        F.min("a").alias("intercept"),
    )
    return dw.select(
        "n_days",
        "slope",
        "intercept",
        F.round(F.col("num") / F.col("den"), 6).alias("dw"),
        F.round(1 - (F.col("num") / F.col("den")) / 2, 6).alias("rho_approx"),
    )


# ---------------------------------------------------------------------------
# R231: Holt-Winters additive seasonal forecast (period 7)
# ---------------------------------------------------------------------------

HW_A = 0.3
HW_OMA = 0.7
HW_B = 0.1
HW_OMB = 0.9
HW_G = 0.2
HW_OMG = 0.8
HW_M = 7
HW_H = 7


def holt_winters_fit(ys: list[float], m: int = HW_M):
    """Additive Holt-Winters recursion; returns (level, trend,
    seasonals) where seasonals[i] is the season value for phase
    (n + 1 + i) mod m — i.e. seasonals[0] applies to the next step.
    Mirrors the oracle's recursive CTE op for op: the seasonal state
    is a ring of the last m seasonal values, exactly the list the
    CTE carries."""
    base = sum(ys[:m]) / m
    base2 = sum(ys[m : 2 * m]) / m
    s = base
    b = (base2 - base) / m
    ring = [ys[i] - base for i in range(m)]  # c_1..c_m
    for t in range(m, len(ys)):
        y = ys[t]
        c_used = ring[0]
        s_new = HW_A * (y - c_used) + HW_OMA * (s + b)
        b = HW_B * (s_new - s) + HW_OMB * b
        c_new = HW_G * (y - s_new) + HW_OMG * c_used
        s = s_new
        ring = ring[1:] + [c_new]
    return s, b, ring


@register(
    "holt_winters_forecast_revenue",
    sql=f"""
    WITH RECURSIVE daily AS (
      SELECT o_orderdate AS day, round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t, rev
      FROM daily
    ),
    init AS (
      SELECT (SELECT sum(rev) FROM idx WHERE t <= {HW_M}) / {HW_M}.0
               AS base,
             (SELECT sum(rev) FROM idx
              WHERE t > {HW_M} AND t <= {2 * HW_M}) / {HW_M}.0 AS base2
    ),
    rec AS (
      SELECT CAST({HW_M} AS BIGINT) AS t,
             i.base AS s,
             (i.base2 - i.base) / {HW_M} AS b,
             (SELECT list(rev - i.base ORDER BY t) FROM idx
              WHERE t <= {HW_M}) AS ring
      FROM init i
      UNION ALL
      SELECT r.t + 1,
             {HW_A} * (i.rev - r.ring[1])
               + {HW_OMA} * (r.s + r.b) AS s_new,
             {HW_B} * (({HW_A} * (i.rev - r.ring[1])
               + {HW_OMA} * (r.s + r.b)) - r.s) + {HW_OMB} * r.b,
             list_slice(r.ring, 2, {HW_M})
               || [{HW_G} * (i.rev - ({HW_A} * (i.rev - r.ring[1])
                    + {HW_OMA} * (r.s + r.b)))
                   + {HW_OMG} * r.ring[1]]
      FROM rec r JOIN idx i ON i.t = r.t + 1
    ),
    fin AS (
      SELECT t AS n_days, s, b, ring FROM rec ORDER BY t DESC LIMIT 1
    )
    SELECT CAST(h.h AS BIGINT) AS h, f.n_days,
           round(f.s, 4) AS level, round(f.b, 6) AS trend,
           round(f.ring[CAST((h.h - 1) % {HW_M} AS INT) + 1], 4)
             AS season,
           round(f.s + h.h * f.b
                 + f.ring[CAST((h.h - 1) % {HW_M} AS INT) + 1], 4)
             AS yhat
    FROM fin f CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS h) h
    """,
)
def holt_winters_forecast_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """R231 additive Holt-Winters (triple exponential smoothing,
    weekly period m=7) forecast of daily revenue, horizon 7: level/
    trend/seasonal recursion with classical initialization (first-
    week mean level, week-over-week trend, first-week seasonal
    offsets). The seasonal state is a RING of the last m seasonals —
    exactly the list the oracle's recursive CTE carries, so both
    engines step bit-identically (literal smoothing constants, same
    op order). Sequential pass over the calendar-bounded day
    pre-aggregate (applyInPandas single constant-key group, same
    waiver class as holt_linear); the 100 TB cost is the one
    decomposable day aggregate."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        ys = pdf["rev"].tolist()
        n = len(ys)
        if n < 2 * HW_M:
            return pd.DataFrame(
                columns=["h", "n_days", "level", "trend", "season", "yhat"]
            )
        s, b, ring = holt_winters_fit(ys)
        rows = [
            (
                h,
                n,
                s,
                b,
                ring[(h - 1) % HW_M],
                s + h * b + ring[(h - 1) % HW_M],
            )
            for h in range(1, HW_H + 1)
        ]
        return pd.DataFrame(
            rows,
            columns=["h", "n_days", "level", "trend", "season", "yhat"],
        )

    raw = (
        daily.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            lambda pdf: hw(pdf),
            schema=(
                "h bigint, n_days bigint, level double, trend double, "
                "season double, yhat double"
            ),
        )
    )
    return raw.select(
        "h",
        "n_days",
        F.round("level", 4).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("season", 4).alias("season"),
        F.round("yhat", 4).alias("yhat"),
    )

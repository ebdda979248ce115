"""Survival-analysis extensions (R200–R201): two-group log-rank test
and the Nelson-Aalen cumulative-hazard estimator, sharing the
right-censored time-to-first-purchase setup of
`kaplan_meier_conversion` (training_prep.py — user spells collapse to
per-day counts, so every frame is CALENDAR-BOUNDED and the running
sums are windows over a ≤|days| pre-aggregate, the repo's documented
bounded-window exception).

Engine parity: risk counts and event counts are exact integers;
hazard terms d/n are exact-integer quotients, so both engines feed
identical doubles into every sum; outputs round at 6dp. The log-rank
normal tail uses the shared Abramowitz-Stegun erf polynomial.

No analog in the reference connector (SURVEY.md §2.11 extension
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.queries import register

_ERF_P_SQL = """round(2 * 0.5 * ((0.254829592 * t - 0.284496736 * t * t
                    + 1.421413741 * t * t * t
                    - 1.453152027 * t * t * t * t
                    + 1.061405429 * t * t * t * t * t)
                   * exp(-(az * az) / 2)), 9)"""

# shared spell construction: per-user time to first purchase (days
# since first activity), right-censored at the observation horizon;
# group 1 = a deterministic md5 placebo arm over user_id (the fixture
# has every user first active on Jan 1-2, so calendar-based cohort
# splits are vacuous — the round-6 vacuous-selector lesson)
_SPELLS_SQL = """
    per_user AS (
      SELECT user_id,
             min(CAST(ts AS DATE)) AS first_day,
             min(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS DATE) END) AS conv_day
      FROM events GROUP BY user_id
    ),
    horizon AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
    spells AS (
      SELECT CASE WHEN p.conv_day IS NOT NULL
                       AND p.conv_day >= p.first_day
                  THEN CAST(p.conv_day - p.first_day AS BIGINT)
                  ELSE CAST(hz.h - p.first_day AS BIGINT) END AS t,
             CASE WHEN p.conv_day IS NOT NULL
                       AND p.conv_day >= p.first_day
                  THEN 1 ELSE 0 END AS converted,
             CASE WHEN substring(md5(CAST(p.user_id AS VARCHAR)), 1, 1)
                  < '8' THEN 1 ELSE 0 END AS grp
      FROM per_user p CROSS JOIN horizon hz
    )
"""


def _spells(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.col("ts").cast("date")
            )
        ).alias("conv_day"),
    )
    horizon = ev.agg(F.max(F.col("ts").cast("date")).alias("h"))
    conv_ok = F.col("conv_day").isNotNull() & (
        F.col("conv_day") >= F.col("first_day")
    )
    arm = (
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8"
    )
    return per_user.crossJoin(F.broadcast(horizon)).select(
        F.when(conv_ok, F.datediff("conv_day", "first_day"))
        .otherwise(F.datediff("h", "first_day"))
        .cast("bigint")
        .alias("t"),
        F.when(conv_ok, 1).otherwise(0).alias("converted"),
        F.when(arm, 1).otherwise(0).alias("grp"),
    )


# ---------------------------------------------------------------------------
# R200: two-group log-rank test
# ---------------------------------------------------------------------------


@register(
    "logrank_arm_conversion",
    sql=f"""
    WITH {_SPELLS_SQL},
    at_t AS (
      SELECT t, grp,
             CAST(sum(converted) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS leaving
      FROM spells GROUP BY t, grp
    ),
    risk AS (
      SELECT t, grp, d,
             CAST(sum(leaving) OVER (PARTITION BY grp ORDER BY t DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS n_g
      FROM at_t
    ),
    -- totals per event time: fill each group's at-risk count even at
    -- times where only the other group has rows, via a full pivot
    tot AS (
      SELECT t,
             CAST(sum(d) AS BIGINT) AS d_all,
             CAST(sum(CASE WHEN grp = 1 THEN d ELSE 0 END) AS BIGINT) AS d1,
             CAST(sum(CASE WHEN grp = 1 THEN n_g ELSE 0 END) AS BIGINT)
               AS n1_part,
             CAST(sum(n_g) AS BIGINT) AS n_part
      FROM risk GROUP BY t
    ),
    filled AS (
      -- a group's true at-risk at time t = max of its running counts
      -- at times >= t; reverse running max fills the gaps
      SELECT t, d_all, d1,
             CAST(max(n1_part) OVER (ORDER BY t DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS n1,
             CAST(max(n_part) OVER (ORDER BY t DESC
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT) AS n
      FROM tot
    ),
    terms AS (
      SELECT d1, d_all * (n1 * 1.0 / n) AS e1,
             CASE WHEN n > 1
                  THEN d_all * (n1 * 1.0 / n) * (1 - n1 * 1.0 / n)
                       * (n - d_all) * 1.0 / greatest(n - 1, 1)
                  ELSE 0.0 END AS v
      FROM filled WHERE d_all > 0
    ),
    agg AS (
      SELECT CAST(sum(d1) AS BIGINT) AS o1,
             sum(e1) AS e1, sum(v) AS v
      FROM terms
    ),
    z AS (
      SELECT o1, round(e1, 4) AS e1_r,
             round((o1 - e1) / sqrt(v), 6) AS z,
             round(pow((o1 - e1), 2) / v, 6) AS chi2
      FROM agg
    )
    SELECT o1 AS observed_1, e1_r AS expected_1, z, chi2,
           {_ERF_P_SQL} AS p_value
    FROM (SELECT o1, e1_r, z, chi2, abs(z) AS az,
                 1 / (1 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
          FROM z)
    """,
)
def logrank_arm_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R200 two-group log-rank test between deterministic md5 placebo
    arms: do the arms convert on different time-to-purchase curves?
    The censoring-correct A/B test for durations (a means test on
    conversion lags silently drops the censored users); the placebo
    split doubles as an A/A calibration check — z should be modest. Per-(day,
    group) counts, reverse running sums for group at-risk (with a
    reverse running MAX to fill days where only one group has rows —
    the subtle gap a naive join drops), then hypergeometric O−E and
    variance terms summed over event days; z and χ² with the shared
    A-S erf tail. Every window runs over the calendar-bounded day
    pre-aggregate."""
    spells = _spells(spark, sf_dir)
    at_t = spells.groupBy("t", "grp").agg(
        F.sum("converted").cast("bigint").alias("d"),
        F.count("*").cast("bigint").alias("leaving"),
    )
    w_g = (
        Window.partitionBy("grp")
        .orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = at_t.withColumn(
        "n_g", F.sum("leaving").over(w_g).cast("bigint")
    )
    tot = risk.groupBy("t").agg(
        F.sum("d").cast("bigint").alias("d_all"),
        F.sum(F.when(F.col("grp") == 1, F.col("d")).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum(F.when(F.col("grp") == 1, F.col("n_g")).otherwise(0))
        .cast("bigint")
        .alias("n1_part"),
        F.sum("n_g").cast("bigint").alias("n_part"),
    )
    w_desc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    filled = tot.select(
        "t",
        "d_all",
        "d1",
        F.max("n1_part").over(w_desc).cast("bigint").alias("n1"),
        F.max("n_part").over(w_desc).cast("bigint").alias("n"),
    )
    frac = F.col("n1") * 1.0 / F.col("n")
    terms = filled.where(F.col("d_all") > 0).select(
        "d1",
        (F.col("d_all") * frac).alias("e1"),
        F.when(
            F.col("n") > 1,
            F.col("d_all")
            * frac
            * (1 - frac)
            * (F.col("n") - F.col("d_all"))
            * 1.0
            # greatest(): ANSI-mode codegen can evaluate the guarded
            # branch's divisor even when the predicate is false
            / F.greatest(F.col("n") - 1, F.lit(1)),
        )
        .otherwise(0.0)
        .alias("v"),
    )
    agg = terms.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum("e1").alias("e1"),
        F.sum("v").alias("v"),
    )
    z = agg.select(
        "o1",
        F.round("e1", 4).alias("e1_r"),
        F.round((F.col("o1") - F.col("e1")) / F.sqrt("v"), 6).alias("z"),
        F.round(
            F.pow(F.col("o1") - F.col("e1"), 2) / F.col("v"), 6
        ).alias("chi2"),
    )
    t = 1 / (1 + 0.3275911 * (F.abs(F.col("z")) / F.sqrt(F.lit(2.0))))
    poly = (
        0.254829592 * t
        - 0.284496736 * t * t
        + 1.421413741 * t * t * t
        - 1.453152027 * t * t * t * t
        + 1.061405429 * t * t * t * t * t
    )
    return z.select(
        F.col("o1").alias("observed_1"),
        F.col("e1_r").alias("expected_1"),
        "z",
        "chi2",
        F.round(
            2
            * 0.5
            * (poly * F.exp(-(F.abs(F.col("z")) * F.abs(F.col("z"))) / 2)),
            9,
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# R201: Nelson-Aalen cumulative hazard
# ---------------------------------------------------------------------------


@register(
    "nelson_aalen_conversion",
    sql=f"""
    WITH {_SPELLS_SQL},
    at_t AS (
      SELECT t,
             CAST(sum(converted) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS leaving
      FROM spells GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             CAST(sum(leaving) OVER (ORDER BY t DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS n_risk
      FROM at_t
    ),
    na AS (
      SELECT t, d, n_risk,
             sum(d * 1.0 / n_risk) OVER (ORDER BY t
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS ch,
             sum(d * 1.0 / (n_risk * CAST(n_risk AS DOUBLE)))
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS vr
      FROM risk WHERE d > 0
    )
    SELECT t AS day, d AS n_events, n_risk,
           round(ch, 6) AS cum_hazard,
           round(sqrt(vr), 6) AS se
    FROM na
    """,
)
def nelson_aalen_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R201 Nelson-Aalen cumulative hazard H(t) = Σ d/n with the
    Poisson-type variance Σ d/n² — the estimator preferred over
    −ln(KM) in small risk sets, and the ingredient of hazard-based
    churn models. Same calendar-bounded day frames as the KM gate;
    d/n and d/n² are exact-integer quotients, so the running sums are
    identical across engines before rounding."""
    spells = _spells(spark, sf_dir)
    at_t = spells.groupBy("t").agg(
        F.sum("converted").cast("bigint").alias("d"),
        F.count("*").cast("bigint").alias("leaving"),
    )
    w_desc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = at_t.withColumn(
        "n_risk", F.sum("leaving").over(w_desc).cast("bigint")
    )
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    na = (
        risk.where(F.col("d") > 0)
        .withColumn(
            "ch", F.sum(F.col("d") * 1.0 / F.col("n_risk")).over(w_asc)
        )
        .withColumn(
            "vr",
            F.sum(
                F.col("d")
                * 1.0
                / (F.col("n_risk") * F.col("n_risk").cast("double"))
            ).over(w_asc),
        )
    )
    return na.select(
        F.col("t").alias("day"),
        F.col("d").alias("n_events"),
        "n_risk",
        F.round("ch", 6).alias("cum_hazard"),
        F.round(F.sqrt("vr"), 6).alias("se"),
    )


# ---------------------------------------------------------------------------
# R236: exponential MLE + KS goodness-of-fit on inter-event gaps
# ---------------------------------------------------------------------------


@register(
    "exponential_fit_interevent",
    sql="""
    WITH g AS (
      SELECT (lead(epoch_us(ts)) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) - epoch_us(ts)) / 1000000.0 AS x
      FROM events
    ),
    gg AS (SELECT x FROM g WHERE x IS NOT NULL AND x > 0),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n, round(avg(x), 6) AS mean_x
      FROM gg
    ),
    pv AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM gg GROUP BY x),
    cum AS (
      SELECT x, cnt,
             CAST(sum(cnt) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS c
      FROM pv
    ),
    dev AS (
      SELECT greatest(
               abs(CAST(c AS DOUBLE) / m.n
                   - (1 - exp(-x / m.mean_x))),
               abs(CAST(c - cnt AS DOUBLE) / m.n
                   - (1 - exp(-x / m.mean_x)))
             ) AS d
      FROM cum CROSS JOIN m
    )
    SELECT m.n AS n_gaps, m.mean_x AS mean_gap_sec,
           round(1.0 / m.mean_x, 8) AS lambda_per_sec,
           (SELECT round(max(d), 6) FROM dev) AS ks_stat
    FROM m
    """,
)
def exponential_fit_interevent(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """R236 parametric survival fit: exponential MLE λ̂ = 1/x̄ on
    per-user inter-event gaps (exact integer microseconds → seconds),
    plus the Kolmogorov-Smirnov goodness-of-fit distance against the
    fitted Exp(λ̂) — both ECDF step sides per distinct gap via the
    prefix-count scan, the fitted CDF evaluated with the ROUNDED mean
    so both engines exponentiate identical arguments. Quantifies how
    non-Poisson the event stream is (burstiness; the continuous twin
    of overdispersion_daily_events). One user-partition window + one
    distinct-value prefix pass."""
    from pyspark.sql import Window

    from zoom_spark.operators.prefix import prefix_sum

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        (
            (
                F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
            )
            / 1000000.0
        ).alias("x")
    ).where(F.col("x").isNotNull() & (F.col("x") > 0))
    m = g.agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("x"), 6).alias("mean_x"),
    )
    pv = g.groupBy("x").agg(F.count("*").cast("bigint").alias("cnt"))
    cum = prefix_sum(pv, "x", "cnt", out_col="c").withColumn(
        "c", F.col("c").cast("bigint")
    )
    fitted = 1 - F.exp(-F.col("x") / F.col("mean_x"))
    dev = cum.crossJoin(F.broadcast(m)).select(
        F.greatest(
            F.abs(F.col("c").cast("double") / F.col("n") - fitted),
            F.abs(
                (F.col("c") - F.col("cnt")).cast("double") / F.col("n")
                - fitted
            ),
        ).alias("d")
    )
    ks = dev.agg(F.round(F.max("d"), 6).alias("ks_stat"))
    return m.crossJoin(F.broadcast(ks)).select(
        F.col("n").alias("n_gaps"),
        F.col("mean_x").alias("mean_gap_sec"),
        F.round(1.0 / F.col("mean_x"), 8).alias("lambda_per_sec"),
        "ks_stat",
    )

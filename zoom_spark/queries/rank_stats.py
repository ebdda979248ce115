"""Round-6 rank/classical statistical tests (R186–R190): Mann-Whitney
U, Kruskal-Wallis H, one-way ANOVA F, Brown-Forsythe (median-centered
Levene) variance homogeneity, and a two-sample effect-size panel
(Cohen's d / Hedges' g / common-language / Cliff's delta).

All rank machinery goes through ``operators.ranks.add_midranks`` (the
two-phase distributed prefix scan — value-collapse + range shuffle +
O(P) offsets), never a global window; the moment-based statistics are
single decomposable aggregates. Mid-ranks are half-integers and the
input values sit on a cent grid, so rank sums and raw-moment sums are
EXACT in IEEE doubles below 2^53 — the Spark plan and the DuckDB
oracle agree bit-for-bit before the final 6dp rounding (driver-gate
discipline, tests/oracle_harness.py). Normal tails use the
Abramowitz-Stegun 7.1.26 erf polynomial written IDENTICALLY on both
engines (Spark has no builtin erf); the chi-square tail for the
(dof=4) Kruskal-Wallis test uses the exact even-dof closed form
exp(-x/2)*(1+x/2).

Reference parity note: the reference pipeline (/root/reference/main.py)
has no analog — these belong to the mandated eval/statistics extension
family (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.operators.ranks import add_midranks
from zoom_spark.queries import register

# Weekend split shared with ks_test_weekend_value / welch_ttest_weekend:
# day index relative to the epoch Monday 2024-01-01, days 5/6 = Sat/Sun.
_WEEKEND_SQL = """
      SELECT value AS v,
             CASE WHEN CAST((CAST(ts AS DATE) - DATE '2024-01-01') % 7
                       AS BIGINT) IN (5, 6) THEN 1 ELSE 0 END AS grp
      FROM events
"""


def _weekend_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wd = (
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        % 7
    ).cast("bigint")
    return ev.select(
        F.col("value").alias("v"),
        F.when(wd.isin(5, 6), 1).otherwise(0).alias("grp"),
    )


def _erf_tail_p(z_abs_col, decimals: int = 9):
    """Two-sided normal tail 2*(1-Phi(|z|)) via the Abramowitz-Stegun
    7.1.26 erfc polynomial — written with the exact same literals and
    operation order as the SQL twin so the approximation (not each
    engine's erf) is the contract."""
    t = 1 / (1 + 0.3275911 * (z_abs_col / F.sqrt(F.lit(2.0))))
    poly = (
        0.254829592 * t
        - 0.284496736 * t * t
        + 1.421413741 * t * t * t
        - 1.453152027 * t * t * t * t
        + 1.061405429 * t * t * t * t * t
    )
    return F.round(
        2 * 0.5 * (poly * F.exp(-(z_abs_col * z_abs_col) / 2)), decimals
    )


_ERF_P_SQL = """round(2 * 0.5 * ((0.254829592 * t - 0.284496736 * t * t
                    + 1.421413741 * t * t * t
                    - 1.453152027 * t * t * t * t
                    + 1.061405429 * t * t * t * t * t)
                   * exp(-(az * az) / 2)), 9)"""


# ---------------------------------------------------------------------------
# R186: Mann-Whitney U (Wilcoxon rank-sum) test
# ---------------------------------------------------------------------------


@register(
    "mann_whitney_u_weekend",
    sql=f"""
    WITH s AS ({_WEEKEND_SQL}),
    pv AS (
      SELECT v, CAST(sum(grp) AS BIGINT) AS na,
             CAST(count(*) - sum(grp) AS BIGINT) AS nb
      FROM s GROUP BY v
    ),
    r AS (
      SELECT na, nb, na + nb AS c,
             sum(na + nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
      FROM pv
    ),
    a AS (
      SELECT CAST(sum(na) AS BIGINT) AS n1, CAST(sum(nb) AS BIGINT) AS n2,
             sum(na * (cum - c + (c + 1) / 2.0)) AS r1,
             sum(CAST(c AS DOUBLE) * c * c - c) AS tt
      FROM r
    ),
    u AS (
      SELECT n1, n2, n1 + n2 AS n,
             r1 - n1 * (n1 + 1) / 2.0 AS u1, tt
      FROM a
    ),
    z AS (
      SELECT n1, n2, round(u1, 1) AS u_stat,
             round((u1 - n1 * n2 / 2.0)
                   / sqrt((n1 * CAST(n2 AS DOUBLE) / 12.0)
                          * ((n + 1) - tt / (CAST(n AS DOUBLE) * (n - 1)))),
                   6) AS z
      FROM u
    )
    SELECT n1 AS n_weekend, n2 AS n_weekday, u_stat, z,
           {_ERF_P_SQL} AS p_value
    FROM (SELECT n1, n2, u_stat, z, abs(z) AS az,
                 1 / (1 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
          FROM z)
    """,
)
def mann_whitney_u_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R186 Mann-Whitney U (Wilcoxon rank-sum) test, weekend vs
    weekday event values: U1 = R1 − n1(n1+1)/2 from weekend mid-rank
    sums, normal approximation with the exact tie-corrected variance
    n1·n2/12·((n+1) − ΣT/(n(n−1))), ΣT = Σ(c³−c) over tie groups (no
    continuity correction — both engines compute the same closed
    form). Rows collapse to per-distinct-value (weekend, weekday)
    counts in one hash aggregate; the running count comes from the
    two-phase distributed prefix scan; everything after is one more
    aggregate — two shuffles total at any scale. Mid-ranks are
    half-integers so U is exact before the 6dp z rounding; the
    two-sided p uses the shared A-S erf polynomial."""
    s = _weekend_events(spark, sf_dir)
    pv = s.groupBy("v").agg(
        F.sum("grp").cast("bigint").alias("na"),
        (F.count("*") - F.sum("grp")).cast("bigint").alias("nb"),
    )
    pv = pv.withColumn("c", (F.col("na") + F.col("nb")).cast("bigint"))
    r = add_midranks(pv, value_col="v", cnt_col="c", out_col="avg_rank")
    a = r.agg(
        F.sum("na").cast("bigint").alias("n1"),
        F.sum("nb").cast("bigint").alias("n2"),
        F.sum(F.col("na") * F.col("avg_rank")).alias("r1"),
        F.sum(
            F.col("c").cast("double") * F.col("c") * F.col("c") - F.col("c")
        ).alias("tt"),
    )
    u = a.select(
        "n1",
        "n2",
        (F.col("n1") + F.col("n2")).alias("n"),
        (F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0).alias("u1"),
        "tt",
    )
    z = u.select(
        "n1",
        "n2",
        F.round(F.col("u1"), 1).alias("u_stat"),
        F.round(
            (F.col("u1") - F.col("n1") * F.col("n2") / 2.0)
            / F.sqrt(
                (F.col("n1") * F.col("n2").cast("double") / 12.0)
                * (
                    (F.col("n") + 1)
                    - F.col("tt")
                    / (F.col("n").cast("double") * (F.col("n") - 1))
                )
            ),
            6,
        ).alias("z"),
    )
    return z.select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        "u_stat",
        "z",
        _erf_tail_p(F.abs(F.col("z"))).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# R187: Kruskal-Wallis H test
# ---------------------------------------------------------------------------


@register(
    "kruskal_wallis_segments",
    sql="""
    WITH j AS (
      SELECT o.o_totalprice AS v, c.c_mktsegment AS seg
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    pg AS (SELECT v, seg, CAST(count(*) AS BIGINT) AS cg
           FROM j GROUP BY v, seg),
    pv AS (SELECT v, CAST(sum(cg) AS BIGINT) AS c FROM pg GROUP BY v),
    r AS (
      SELECT v, c,
             sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum
      FROM pv
    ),
    ranks AS (SELECT v, c, cum - c + (c + 1) / 2.0 AS avg_rank FROM r),
    g AS (
      SELECT pg.seg,
             CAST(sum(pg.cg) AS BIGINT) AS ng,
             sum(pg.cg * ranks.avg_rank) AS rg,
             sum(pg.cg * (CAST(ranks.c AS DOUBLE) * ranks.c - 1)) AS tg
      FROM pg JOIN ranks ON pg.v = ranks.v
      GROUP BY pg.seg
    ),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS k_groups,
             CAST(sum(ng) AS BIGINT) AS n,
             sum(rg * rg / ng) AS s,
             sum(tg) AS tt
      FROM g
    ),
    h AS (
      SELECT k_groups, n,
             round(12.0 * s / (n * (n + 1.0)) - 3 * (n + 1.0), 6) AS h_stat,
             round((12.0 * s / (n * (n + 1.0)) - 3 * (n + 1.0))
                   / (1 - tt / (CAST(n AS DOUBLE) * n * n - n)),
                   6) AS h_tie_corrected
      FROM a
    )
    SELECT k_groups, n, h_stat, h_tie_corrected,
           CASE WHEN k_groups = 5
                THEN round(exp(-h_tie_corrected / 2)
                           * (1 + h_tie_corrected / 2), 9)
                ELSE NULL END AS p_value
    FROM h
    """,
)
def kruskal_wallis_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R187 Kruskal-Wallis H test: does order value differ across the
    five market segments? H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1) with the
    tie-correction divisor 1 − ΣT/(N³−N). Rank sums come from the
    distinct-value mid-rank frame (two-phase prefix scan) joined back
    to per-(value, segment) counts — the tie term folds into the SAME
    per-segment aggregate via Σ c_g·(c²−1) (summing over group slices
    of a tie group reconstitutes c³−c exactly), so the whole statistic
    is one chain of decomposable aggregates: no global window, no
    scalar cross join. The dof=4 chi-square tail uses the exact
    even-dof closed form exp(−H/2)(1+H/2), emitted only when all five
    segments are present."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, c["c_custkey"] == o["o_custkey"]).select(
        F.col("o_totalprice").alias("v"), F.col("c_mktsegment").alias("seg")
    )
    pg = j.groupBy("v", "seg").agg(F.count("*").cast("bigint").alias("cg"))
    pv = pg.groupBy("v").agg(F.sum("cg").cast("bigint").alias("c"))
    ranks = add_midranks(pv, value_col="v", cnt_col="c", out_col="avg_rank")
    g = (
        pg.join(ranks, on="v")
        .groupBy("seg")
        .agg(
            F.sum("cg").cast("bigint").alias("ng"),
            F.sum(F.col("cg") * F.col("avg_rank")).alias("rg"),
            F.sum(
                F.col("cg")
                * (F.col("c").cast("double") * F.col("c") - 1)
            ).alias("tg"),
        )
    )
    a = g.agg(
        F.count("*").cast("bigint").alias("k_groups"),
        F.sum("ng").cast("bigint").alias("n"),
        F.sum(F.col("rg") * F.col("rg") / F.col("ng")).alias("s"),
        F.sum("tg").alias("tt"),
    )
    h_expr = 12.0 * F.col("s") / (F.col("n") * (F.col("n") + 1.0)) - 3 * (
        F.col("n") + 1.0
    )
    tie_div = 1 - F.col("tt") / (
        F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    )
    h = a.select(
        "k_groups",
        "n",
        F.round(h_expr, 6).alias("h_stat"),
        F.round(h_expr / tie_div, 6).alias("h_tie_corrected"),
    )
    return h.select(
        "k_groups",
        "n",
        "h_stat",
        "h_tie_corrected",
        F.when(
            F.col("k_groups") == 5,
            F.round(
                F.exp(-F.col("h_tie_corrected") / 2)
                * (1 + F.col("h_tie_corrected") / 2),
                9,
            ),
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# R188: one-way ANOVA F test
# ---------------------------------------------------------------------------


@register(
    "anova_f_segments",
    sql="""
    WITH j AS (
      SELECT o.o_totalprice AS y, c.c_mktsegment AS seg
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    g AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS ng,
             round(avg(y), 6) AS m,
             round(var_samp(y), 2) AS vv
      FROM j GROUP BY seg
    ),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS k_groups,
             CAST(sum(ng) AS BIGINT) AS n,
             sum(ng * m) AS sm,
             sum(ng * m * m) AS sm2,
             sum((ng - 1) * vv) AS ssw
      FROM g
    )
    SELECT k_groups, n,
           round((sm2 - sm * sm / n) / 1000000.0, 4) AS ssb_millions,
           round(ssw / 1000000.0, 4) AS ssw_millions,
           round(((sm2 - sm * sm / n) / (k_groups - 1))
                 / (ssw / (n - k_groups)), 6) AS f_stat,
           round((sm2 - sm * sm / n) / ((sm2 - sm * sm / n) + ssw), 6)
             AS eta_squared
    FROM a
    """,
)
def anova_f_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R188 one-way ANOVA F test of order value across the five market
    segments: F = (SSB/(k−1))/(SSW/(N−k)) with effect size
    η² = SSB/(SSB+SSW). Per-group moments come from ONE decomposable
    aggregate with the engine-parity rounding discipline (avg→6dp,
    var_samp→2dp — both engines then compute from identical inputs);
    SSB is reconstructed as Σn_g·m_g² − (Σn_g·m_g)²/N, so the whole
    statistic is a 5-row aggregate chain with no second data pass, no
    broadcast scalar join, no window. The cent-grid input keeps
    Σn_g·m_g exact in doubles; SSB carries ~1e-16 relative error, so
    the 4dp millions-scaled SSB/SSW and 6dp F are stable (raw SSW
    exceeds the 2^53 cent-grid-exact range at sf0.1, so it is reported
    millions-scaled too)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, c["c_custkey"] == o["o_custkey"]).select(
        F.col("o_totalprice").alias("y"), F.col("c_mktsegment").alias("seg")
    )
    g = j.groupBy("seg").agg(
        F.count("*").cast("bigint").alias("ng"),
        F.round(F.avg("y"), 6).alias("m"),
        F.round(F.var_samp("y"), 2).alias("vv"),
    )
    a = g.agg(
        F.count("*").cast("bigint").alias("k_groups"),
        F.sum("ng").cast("bigint").alias("n"),
        F.sum(F.col("ng") * F.col("m")).alias("sm"),
        F.sum(F.col("ng") * F.col("m") * F.col("m")).alias("sm2"),
        F.sum((F.col("ng") - 1) * F.col("vv")).alias("ssw"),
    )
    ssb = F.col("sm2") - F.col("sm") * F.col("sm") / F.col("n")
    return a.select(
        "k_groups",
        "n",
        F.round(ssb / 1000000.0, 4).alias("ssb_millions"),
        F.round(F.col("ssw") / 1000000.0, 4).alias("ssw_millions"),
        F.round(
            (ssb / (F.col("k_groups") - 1))
            / (F.col("ssw") / (F.col("n") - F.col("k_groups"))),
            6,
        ).alias("f_stat"),
        F.round(ssb / (ssb + F.col("ssw")), 6).alias("eta_squared"),
    )


# ---------------------------------------------------------------------------
# R189: Brown-Forsythe (median-centered Levene) variance homogeneity
# ---------------------------------------------------------------------------


@register(
    "levene_brown_forsythe",
    sql="""
    WITH med AS (
      SELECT c_mktsegment AS seg,
             round(quantile_cont(c_acctbal, 0.5), 4) AS med
      FROM customer GROUP BY c_mktsegment
    ),
    z AS (
      SELECT c.c_mktsegment AS seg, abs(c.c_acctbal - m.med) AS z
      FROM customer c JOIN med m ON m.seg = c.c_mktsegment
    ),
    g AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS ng,
             round(avg(z), 6) AS m,
             round(var_samp(z), 2) AS vv
      FROM z GROUP BY seg
    ),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS k_groups,
             CAST(sum(ng) AS BIGINT) AS n,
             sum(ng * m) AS sm,
             sum(ng * m * m) AS sm2,
             sum((ng - 1) * vv) AS ssw
      FROM g
    )
    SELECT k_groups, n,
           round(((sm2 - sm * sm / n) / (k_groups - 1))
                 / (ssw / (n - k_groups)), 6) AS w_stat
    FROM a
    """,
)
def levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R189 Brown-Forsythe test (median-centered Levene): are account
    balance variances homogeneous across market segments? W is the
    one-way ANOVA F computed on z = |x − median_g|. Per-group exact
    medians (5 rows — at warehouse scale swap in percentile_approx)
    are rounded to 4dp on both engines (the cent-grid median is a
    0.005-grid value, exactly representable), broadcast back, and the
    rest is the same single decomposable aggregate chain as
    anova_f_segments — no global window, no scalar cross join."""
    cust = load_table(spark, sf_dir, "customer")
    med = cust.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("med")
    )
    z = (
        cust.join(
            F.broadcast(med), cust["c_mktsegment"] == med["seg"]
        ).select("seg", F.abs(F.col("c_acctbal") - F.col("med")).alias("z"))
    )
    g = z.groupBy("seg").agg(
        F.count("*").cast("bigint").alias("ng"),
        F.round(F.avg("z"), 6).alias("m"),
        F.round(F.var_samp("z"), 2).alias("vv"),
    )
    a = g.agg(
        F.count("*").cast("bigint").alias("k_groups"),
        F.sum("ng").cast("bigint").alias("n"),
        F.sum(F.col("ng") * F.col("m")).alias("sm"),
        F.sum(F.col("ng") * F.col("m") * F.col("m")).alias("sm2"),
        F.sum((F.col("ng") - 1) * F.col("vv")).alias("ssw"),
    )
    ssb = F.col("sm2") - F.col("sm") * F.col("sm") / F.col("n")
    return a.select(
        "k_groups",
        "n",
        F.round(
            (ssb / (F.col("k_groups") - 1))
            / (F.col("ssw") / (F.col("n") - F.col("k_groups"))),
            6,
        ).alias("w_stat"),
    )


# ---------------------------------------------------------------------------
# R190: two-sample effect-size panel
# ---------------------------------------------------------------------------


@register(
    "effect_sizes_weekend",
    sql=f"""
    WITH s AS ({_WEEKEND_SQL}),
    pv AS (
      SELECT v, CAST(sum(grp) AS BIGINT) AS na,
             CAST(count(*) - sum(grp) AS BIGINT) AS nb
      FROM s GROUP BY v
    ),
    r AS (
      SELECT v, na, nb, na + nb AS c,
             sum(na + nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
      FROM pv
    ),
    a AS (
      SELECT CAST(sum(na) AS BIGINT) AS n1, CAST(sum(nb) AS BIGINT) AS n2,
             sum(na * (cum - c + (c + 1) / 2.0)) AS r1,
             sum(na * v) AS sa, sum(na * v * v) AS sa2,
             sum(nb * v) AS sb, sum(nb * v * v) AS sb2
      FROM r
    ),
    m AS (
      SELECT n1, n2,
             r1 - n1 * (n1 + 1) / 2.0 AS u1,
             sa / n1 AS m1, sb / n2 AS m0,
             (sa2 - sa * sa / n1) / (n1 - 1) AS v1,
             (sb2 - sb * sb / n2) / (n2 - 1) AS v0
      FROM a
    ),
    d AS (
      SELECT n1, n2, u1,
             (m1 - m0) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v0)
                              / (n1 + n2 - 2)) AS cohens_d_raw
      FROM m
    )
    SELECT n1 AS n_weekend, n2 AS n_weekday,
           round(cohens_d_raw, 6) AS cohens_d,
           round(cohens_d_raw * (1 - 3.0 / (4 * (n1 + n2) - 9)), 6)
             AS hedges_g,
           round(u1 / (n1 * CAST(n2 AS DOUBLE)), 6) AS cles,
           round(2 * u1 / (n1 * CAST(n2 AS DOUBLE)) - 1, 6) AS cliffs_delta
    FROM d
    """,
)
def effect_sizes_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R190 two-sample effect-size panel (weekend vs weekday event
    values) — the numbers a test report should carry alongside its
    p-value: Cohen's d (pooled-SD standardized mean difference),
    Hedges' g (small-sample bias correction 1 − 3/(4n−9)), the
    common-language effect size P(X>Y) = U/(n1·n2) (mid-rank handling
    of ties), and Cliff's delta = 2·CLES − 1. One per-distinct-value
    aggregate feeds BOTH the moment sums (cent-grid products stay
    exact in doubles) and the mid-rank U via the two-phase prefix scan
    — a single aggregate chain, no second data pass, no scalar cross
    join, no global window."""
    s = _weekend_events(spark, sf_dir)
    pv = s.groupBy("v").agg(
        F.sum("grp").cast("bigint").alias("na"),
        (F.count("*") - F.sum("grp")).cast("bigint").alias("nb"),
    )
    pv = pv.withColumn("c", (F.col("na") + F.col("nb")).cast("bigint"))
    r = add_midranks(pv, value_col="v", cnt_col="c", out_col="avg_rank")
    a = r.agg(
        F.sum("na").cast("bigint").alias("n1"),
        F.sum("nb").cast("bigint").alias("n2"),
        F.sum(F.col("na") * F.col("avg_rank")).alias("r1"),
        F.sum(F.col("na") * F.col("v")).alias("sa"),
        F.sum(F.col("na") * F.col("v") * F.col("v")).alias("sa2"),
        F.sum(F.col("nb") * F.col("v")).alias("sb"),
        F.sum(F.col("nb") * F.col("v") * F.col("v")).alias("sb2"),
    )
    m = a.select(
        "n1",
        "n2",
        (F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0).alias("u1"),
        (F.col("sa") / F.col("n1")).alias("m1"),
        (F.col("sb") / F.col("n2")).alias("m0"),
        (
            (F.col("sa2") - F.col("sa") * F.col("sa") / F.col("n1"))
            / (F.col("n1") - 1)
        ).alias("v1"),
        (
            (F.col("sb2") - F.col("sb") * F.col("sb") / F.col("n2"))
            / (F.col("n2") - 1)
        ).alias("v0"),
    )
    d = m.select(
        "n1",
        "n2",
        "u1",
        (
            (F.col("m1") - F.col("m0"))
            / F.sqrt(
                ((F.col("n1") - 1) * F.col("v1") + (F.col("n2") - 1) * F.col("v0"))
                / (F.col("n1") + F.col("n2") - 2)
            )
        ).alias("cohens_d_raw"),
    )
    return d.select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        F.round(F.col("cohens_d_raw"), 6).alias("cohens_d"),
        F.round(
            F.col("cohens_d_raw")
            * (1 - 3.0 / (4 * (F.col("n1") + F.col("n2")) - 9)),
            6,
        ).alias("hedges_g"),
        F.round(F.col("u1") / (F.col("n1") * F.col("n2").cast("double")), 6).alias(
            "cles"
        ),
        F.round(
            2 * F.col("u1") / (F.col("n1") * F.col("n2").cast("double")) - 1, 6
        ).alias("cliffs_delta"),
    )


# ---------------------------------------------------------------------------
# R202: Cochran-Armitage trend test
# ---------------------------------------------------------------------------


@register(
    "cochran_armitage_weekday_trend",
    sql=f"""
    WITH s AS (
      SELECT CAST((CAST(ts AS DATE) - DATE '2024-01-01') % 7 AS BIGINT) AS w,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
      FROM events
    ),
    g AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n_w,
             CAST(sum(x) AS BIGINT) AS r_w
      FROM s GROUP BY w
    ),
    a AS (
      SELECT CAST(sum(n_w) AS BIGINT) AS n, CAST(sum(r_w) AS BIGINT) AS r,
             sum(w * r_w) AS swr, sum(w * n_w) AS sw,
             sum(w * w * n_w) AS sw2
      FROM g
    ),
    z AS (
      -- T = Σw·r_w − p̄·Σw·n_w (same algebra as the engine side)
      SELECT n, r,
             round((swr - (r * 1.0 / n) * sw)
                   / sqrt((r * 1.0 / n) * (1 - r * 1.0 / n)
                          * (sw2 - sw * sw / n)), 6) AS z
      FROM a
    )
    SELECT n AS n_events, r AS n_purchases, z,
           {_ERF_P_SQL} AS p_value
    FROM (SELECT n, r, z, abs(z) AS az,
                 1 / (1 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
          FROM z)
    """,
)
def cochran_armitage_weekday_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """R202 Cochran-Armitage test for TREND in a binomial rate across
    ordered doses (purchase share across the weekday index 0..6) —
    more powerful than the omnibus chi-square when the alternative is
    monotone. T = Σw(r_w − n_w·p̄), Var = p̄(1−p̄)(Σw²n − (Σwn)²/N):
    one 7-group aggregate chain on exact integer counts (p̄ is the
    only division), no window over data, no cross join. Two-sided p
    via the shared A-S erf polynomial."""
    ev = load_table(spark, sf_dir, "events")
    wd = (
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        % 7
    ).cast("bigint")
    s = ev.select(
        wd.alias("w"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("x"),
    )
    g = s.groupBy("w").agg(
        F.count("*").cast("bigint").alias("n_w"),
        F.sum("x").cast("bigint").alias("r_w"),
    )
    a = g.agg(
        F.sum("n_w").cast("bigint").alias("n"),
        F.sum("r_w").cast("bigint").alias("r"),
        F.sum(F.col("w") * F.col("r_w")).alias("swr"),
        F.sum(F.col("w") * F.col("n_w")).alias("sw"),
        F.sum(F.col("w") * F.col("w") * F.col("n_w")).alias("sw2"),
    )
    # T = Σw·r_w − p̄·Σw·n_w  (algebraically equal to Σw(r_w − n_w·p̄))
    pbar = F.col("r") * 1.0 / F.col("n")
    z = a.select(
        "n",
        "r",
        F.round(
            (F.col("swr") - pbar * F.col("sw"))
            / F.sqrt(
                pbar * (1 - pbar)
                * (F.col("sw2") - F.col("sw") * F.col("sw") / F.col("n"))
            ),
            6,
        ).alias("z"),
    )
    return z.select(
        F.col("n").alias("n_events"),
        F.col("r").alias("n_purchases"),
        "z",
        _erf_tail_p(F.abs(F.col("z"))).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# R232: Friedman test + Kendall's W over weekday blocks
# ---------------------------------------------------------------------------


@register(
    "friedman_priority_by_weekday",
    sql="""
    WITH cell AS (
      SELECT CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 7
               AS BIGINT) AS block,
             o_orderpriority AS trt,
             round(avg(o_totalprice), 4) AS m
      FROM orders GROUP BY 1, 2
    ),
    rk AS (
      SELECT block, trt,
             CAST(rank() OVER (PARTITION BY block ORDER BY m) AS BIGINT)
               AS r
      FROM cell
    ),
    rj AS (
      SELECT trt, CAST(sum(r) AS BIGINT) AS rsum,
             CAST(count(*) AS BIGINT) AS b
      FROM rk GROUP BY trt
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k, any_value(b) AS b,
             CAST(sum(rsum * rsum) AS BIGINT) AS ss
      FROM rj
    )
    SELECT k AS n_treatments, b AS n_blocks,
           round(12.0 * ss / (b * k * (k + 1)) - 3.0 * b * (k + 1), 6)
             AS friedman_chi2,
           round((12.0 * ss / (b * k * (k + 1)) - 3.0 * b * (k + 1))
                 / (b * (k - 1)), 6) AS kendalls_w
    FROM agg
    """,
)
def friedman_priority_by_weekday(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """R232 Friedman rank test: do the 5 priority classes
    consistently order by mean order value across the 7 weekday
    blocks? Rank-within-block (7-row partitions over the 35-cell
    pre-aggregate — constant-sized), χ²_F = 12/(bk(k+1))·ΣR_j² −
    3b(k+1), plus Kendall's W = χ²_F/(b(k−1)) concordance. Cell
    means are rounded before ranking so tie behavior is identical on
    both engines; all sums exact integers after ranking. The
    repeated-measures sibling of kruskal_wallis_segments."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cell = o.groupBy(
        (
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            % 7
        )
        .cast("bigint")
        .alias("block"),
        F.col("o_orderpriority").alias("trt"),
    ).agg(F.round(F.avg("o_totalprice"), 4).alias("m"))
    w = Window.partitionBy("block").orderBy("m")
    rk = cell.select(
        "block", "trt", F.rank().over(w).cast("bigint").alias("r")
    )
    rj = rk.groupBy("trt").agg(
        F.sum("r").cast("bigint").alias("rsum"),
        F.count("*").cast("bigint").alias("b"),
    )
    agg = rj.agg(
        F.count("*").cast("bigint").alias("k"),
        F.any_value("b").alias("b"),
        F.sum(F.col("rsum") * F.col("rsum")).cast("bigint").alias("ss"),
    )
    chi2 = (
        12.0 * F.col("ss") / (F.col("b") * F.col("k") * (F.col("k") + 1))
        - 3.0 * F.col("b") * (F.col("k") + 1)
    )
    return agg.select(
        F.col("k").alias("n_treatments"),
        F.col("b").alias("n_blocks"),
        F.round(chi2, 6).alias("friedman_chi2"),
        F.round(chi2 / (F.col("b") * (F.col("k") - 1)), 6).alias(
            "kendalls_w"
        ),
    )


# ---------------------------------------------------------------------------
# R233: overdispersion (index of dispersion) test on daily event counts
# ---------------------------------------------------------------------------


@register(
    "overdispersion_daily_events",
    sql="""
    WITH day AS (
      SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS total,
             round(avg(c), 6) AS mean_c,
             round(var_samp(c), 6) AS var_c
      FROM day
    )
    SELECT n AS n_days, total AS n_events, mean_c, var_c,
           round(var_c / mean_c, 6) AS dispersion_index,
           round((n - 1) * var_c / mean_c, 6) AS chi2_stat
    FROM m
    """,
)
def overdispersion_daily_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """R233 Poisson overdispersion check on daily event counts: the
    index of dispersion D = s²/x̄ (D≈1 under Poisson) and the
    conditional chi-square statistic (n−1)·D — the first diagnostic
    before fitting any count model (negative-binomial vs Poisson).
    One day-level aggregate, one 1-row moment reduce; mean/variance
    rounded before the ratio."""
    ev = load_table(spark, sf_dir, "events")
    day = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    m = day.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("total"),
        F.round(F.avg("c"), 6).alias("mean_c"),
        F.round(F.var_samp("c"), 6).alias("var_c"),
    )
    return m.select(
        F.col("n").alias("n_days"),
        F.col("total").alias("n_events"),
        "mean_c",
        "var_c",
        F.round(F.col("var_c") / F.col("mean_c"), 6).alias(
            "dispersion_index"
        ),
        F.round(
            (F.col("n") - 1) * F.col("var_c") / F.col("mean_c"), 6
        ).alias("chi2_stat"),
    )

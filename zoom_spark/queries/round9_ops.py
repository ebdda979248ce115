"""Round-9 operator additions (R327+, SURVEY.md §2.18).

Families, chosen to fill the association/effect-size, survival-
regression, clustering-validity, and exact-ANN gaps left after
rounds 2-8 (concept-grepped against the registry first — the
round-7 lesson):

- effect sizes / ordinal association: Cliff's delta, Goodman-Kruskal
  gamma, Theil's U (uncertainty coefficient), concordance correlation
- clustering validity: Calinski-Harabasz over the labeled embeddings
- survival regression: Cox proportional-hazards one-step estimator
- similarity: sign-bit Hamming kNN (binary embedding search — exact,
  so the ANN family gains a value-hashed member at production shape)
- record linkage: longest-common-substring feature over blocked pairs
- GLM: Poisson IRLS regression (unrolled, snapped)

Engine-parity discipline (shared with rounds 4-8): decomposable
aggregates only; moments snapped on the shared floor(x*1e9+0.5) grid
before closed-form solves; transcendental inputs rounded BEFORE the
call so both engines see identical arguments; rank statistics go
through the distinct-value prefix frame, never a data-sized global
window; integer-exact arithmetic preferred over snap schedules
wherever inputs can be quantized once (sign bits, cent grids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.queries import register


# ---------------------------------------------------------------------------
# R327 Cliff's delta (ordinal effect size), weekend vs weekday values
# ---------------------------------------------------------------------------


@register(
    "cliffs_delta_weekend",
    sql="""
    WITH s AS (
      SELECT value AS v,
             CASE WHEN CAST((CAST(ts AS DATE) - DATE '2024-01-01') % 7
                       AS BIGINT) IN (5, 6) THEN 1 ELSE 0 END AS grp
      FROM events
    ),
    pv AS (
      SELECT v, CAST(sum(grp) AS BIGINT) AS na,
             CAST(count(*) - sum(grp) AS BIGINT) AS nb
      FROM s GROUP BY v
    ),
    r AS (
      SELECT v, na, nb,
             sum(nb) OVER w - nb AS b_below,
             sum(na) OVER w - na AS a_below
      FROM pv
      WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    agg AS (
      SELECT CAST(sum(na) AS BIGINT) AS m,
             CAST(sum(nb) AS BIGINT) AS n,
             CAST(sum(na * b_below) AS BIGINT) AS gt,
             CAST(sum(nb * a_below) AS BIGINT) AS lt
      FROM r
    )
    SELECT m AS n_weekend, n AS n_weekday,
           round(CAST(gt - lt AS DOUBLE) / (CAST(m AS DOUBLE) * n), 6)
             AS cliffs_delta
    FROM agg
    """,
)
def cliffs_delta_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R327 Cliff's delta, weekend vs weekday event values: the
    nonparametric ordinal effect size delta = (#(a>b) - #(a<b))/(m*n)
    — the recommended companion to Mann-Whitney/Brunner-Munzel
    (registry R?/R325) because it is bounded, tie-robust and needs
    no distribution assumption.  Pair counts come from the SAME
    distinct-value prefix frame as the rank tests: #(a>b) =
    sum_v na(v) * (#b strictly below v), one pass, two running
    counts — all-integer until the single final division, so the
    6dp hash is drift-free.  Two shuffles total at any scale."""
    from zoom_spark.operators.prefix import prefix_sum
    from zoom_spark.queries.rank_stats import _weekend_events

    s = _weekend_events(spark, sf_dir)
    pv = s.groupBy("v").agg(
        F.sum("grp").cast("bigint").alias("na"),
        (F.count("*") - F.sum("grp")).cast("bigint").alias("nb"),
    )
    r = prefix_sum(pv, "v", "nb", out_col="cb")
    r = prefix_sum(r, "v", "na", out_col="ca")
    agg = r.agg(
        F.sum("na").cast("bigint").alias("m"),
        F.sum("nb").cast("bigint").alias("n"),
        F.sum(F.col("na") * (F.col("cb") - F.col("nb")))
        .cast("bigint")
        .alias("gt"),
        F.sum(F.col("nb") * (F.col("ca") - F.col("na")))
        .cast("bigint")
        .alias("lt"),
    )
    return agg.select(
        F.col("m").alias("n_weekend"),
        F.col("n").alias("n_weekday"),
        F.round(
            (F.col("gt") - F.col("lt"))
            / (F.col("m").cast("double") * F.col("n")),
            6,
        ).alias("cliffs_delta"),
    )


# ---------------------------------------------------------------------------
# R328 Goodman-Kruskal gamma: order priority vs price decile
# ---------------------------------------------------------------------------


@register(
    "gk_gamma_priority_price",
    sql="""
    WITH o AS (
      SELECT CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS x,
             CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS y
      FROM orders
    ),
    grid AS (
      SELECT x, y, CAST(count(*) AS BIGINT) AS n
      FROM o GROUP BY x, y
    ),
    pairs AS (
      SELECT CAST(sum(CASE WHEN b.x > a.x AND b.y > a.y
                           THEN a.n * b.n ELSE 0 END) AS BIGINT) AS conc,
             CAST(sum(CASE WHEN b.x > a.x AND b.y < a.y
                           THEN a.n * b.n ELSE 0 END) AS BIGINT) AS disc
      FROM grid a JOIN grid b ON (b.x, b.y) <> (a.x, a.y)
    )
    SELECT conc AS concordant, disc AS discordant,
           round(CAST(conc - disc AS DOUBLE) / (conc + disc), 6) AS gamma
    FROM pairs
    """,
)
def gk_gamma_priority_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R328 Goodman-Kruskal gamma between order priority (ordinal
    1-URGENT..5-LOW) and total-price bucket: gamma = (C - D)/(C + D)
    counts only concordant/discordant pairs, ignoring ties — the
    ordinal association measure for heavily-tied contingency data
    (Kendall tau-b, registry, penalizes ties instead).  The raw
    stream collapses to the priority x bucket contingency GRID (one
    hash aggregate, <= 5 x ~25 cells at any SF), then C and D are a
    closed-form grid self-join — the Jonckheere-Terpstra (R324)
    shape: per-pair work is grid^2, data-size-independent.  All
    integer until the final division."""
    o = load_table(spark, sf_dir, "orders")
    grid = (
        o.select(
            F.substring("o_orderpriority", 1, 1).cast("int").alias("x"),
            F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias(
                "y"
            ),
        )
        .groupBy("x", "y")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    a = grid.select(
        F.col("x").alias("xa"), F.col("y").alias("ya"), F.col("n").alias("na")
    )
    b = grid.select(
        F.col("x").alias("xb"), F.col("y").alias("yb"), F.col("n").alias("nb")
    )
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("xa") != F.col("xb")) | (F.col("ya") != F.col("yb")),
        )
        .agg(
            F.sum(
                F.when(
                    (F.col("xb") > F.col("xa")) & (F.col("yb") > F.col("ya")),
                    F.col("na") * F.col("nb"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("concordant"),
            F.sum(
                F.when(
                    (F.col("xb") > F.col("xa")) & (F.col("yb") < F.col("ya")),
                    F.col("na") * F.col("nb"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("discordant"),
        )
    )
    return pairs.select(
        "concordant",
        "discordant",
        F.round(
            (F.col("concordant") - F.col("discordant")).cast("double")
            / (F.col("concordant") + F.col("discordant")),
            6,
        ).alias("gamma"),
    )


# ---------------------------------------------------------------------------
# R329 Theil's U (uncertainty coefficient): status given priority
# ---------------------------------------------------------------------------


@register(
    "theils_u_status_priority",
    sql="""
    WITH o AS (
      SELECT o_orderpriority AS x, o_orderstatus AS y FROM orders
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
    -- H(Y): entropy of the status marginal; ln arguments are
    -- 9dp-snapped probabilities so both engines call ln on
    -- identical doubles
    hy AS (
      SELECT -sum(p * ln(p)) AS h FROM (
        SELECT floor(CAST(count(*) AS DOUBLE) / any_value(t.n)
                     * 1e9 + 0.5) / 1e9 AS p
        FROM o CROSS JOIN tot t GROUP BY y
      )
    ),
    -- H(Y|X) = sum_x p(x) * H(Y | X = x)
    hyx AS (
      SELECT sum(pxy * ln(pyx)) * -1 AS h FROM (
        SELECT floor(CAST(count(*) AS DOUBLE) / any_value(t.n)
                     * 1e9 + 0.5) / 1e9 AS pxy,
               floor(CAST(count(*) AS DOUBLE)
                     / sum(count(*)) OVER (PARTITION BY x)
                     * 1e9 + 0.5) / 1e9 AS pyx
        FROM o CROSS JOIN tot t GROUP BY x, y
      )
    )
    SELECT round(hy.h, 6) AS h_status,
           round(hyx.h, 6) AS h_status_given_priority,
           round((hy.h - hyx.h) / hy.h, 6) AS theils_u
    FROM hy CROSS JOIN hyx
    """,
)
def theils_u_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R329 Theil's uncertainty coefficient U(status | priority) =
    (H(Y) - H(Y|X)) / H(Y): the ASYMMETRIC categorical association
    measure (how much knowing the priority reduces status entropy),
    complementing the symmetric chi-square/Cramer family already
    gated.  Both entropies reduce to the tiny contingency grid (one
    hash aggregate); ln() arguments are probabilities snapped on the
    shared 9dp floor grid BEFORE the call, so engine libm vs JVM
    StrictMath 1-ulp drift cannot occur (round-8 transcendental
    rule).  Map-side-partial aggregate, grid-sized driver math."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("x"), F.col("o_orderstatus").alias("y")
    )
    snap9 = lambda c: F.floor(c * 1e9 + F.lit(0.5)) / 1e9  # noqa: E731
    tot = o.agg(F.count("*").cast("bigint").alias("n"))
    ymarg = (
        o.groupBy("y")
        .agg(F.count("*").cast("double").alias("c"))
        .crossJoin(F.broadcast(tot))
        .select(snap9(F.col("c") / F.col("n")).alias("p"))
    )
    hy = ymarg.agg((-F.sum(F.col("p") * F.log("p"))).alias("h"))
    from pyspark.sql import Window

    wx = Window.partitionBy("x")
    cell = (
        o.groupBy("x", "y")
        .agg(F.count("*").cast("double").alias("c"))
        .withColumn("cx", F.sum("c").over(wx))
        .crossJoin(F.broadcast(tot))
        .select(
            snap9(F.col("c") / F.col("n")).alias("pxy"),
            snap9(F.col("c") / F.col("cx")).alias("pyx"),
        )
    )
    hyx = cell.agg((-F.sum(F.col("pxy") * F.log("pyx"))).alias("h"))
    return (
        hy.select(F.col("h").alias("h_y"))
        .crossJoin(hyx.select(F.col("h").alias("h_yx")))
        .select(
            F.round("h_y", 6).alias("h_status"),
            F.round("h_yx", 6).alias("h_status_given_priority"),
            F.round((F.col("h_y") - F.col("h_yx")) / F.col("h_y"), 6).alias(
                "theils_u"
            ),
        )
    )

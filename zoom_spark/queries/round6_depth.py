"""Round-6 depth operators (R164–R168): warehouse data-skipping zone
maps, classical seasonal decomposition, lift/gains deciles, a
k-anonymity / l-diversity governance report, and seeded
differential-privacy noisy counts.

Each query is Spark-first (JVM expressions, bounded joins, two-phase
ranks instead of global windows) with an exact DuckDB oracle twin;
floats are rounded on both sides before compare (driver-gate
discipline, see tests/oracle_harness.py).

Reference parity note: the reference pipeline (/root/reference/main.py)
has no analog for any of these — they belong to the mandated
LLM-pipeline / warehouse extension family (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.queries import register

ZM_PRED_DATE = "1997-06-01"  # the scan predicate the report evaluates


@register(
    "zone_map_skipping_report",
    sql=f"""
    WITH zm AS (
      SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)
               AS chunk,
             CAST(count(*) AS BIGINT) AS n_rows,
             min(l_shipdate) AS min_ship,
             max(l_shipdate) AS max_ship
      FROM lineitem GROUP BY 1
    )
    SELECT chunk, n_rows, min_ship, max_ship,
           (max_ship < DATE '{ZM_PRED_DATE}') AS prunable
    FROM zm
    """,
)
def zone_map_skipping_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R164 zone-map data skipping: per ingest-month chunk (the proxy
    for a parquet row group / file split under time-clustered ingest —
    the layout a streaming or batch loader naturally produces), record
    min/max of the predicate column and whether the chunk is prunable
    for `l_shipdate >= {ZM_PRED_DATE}` — exactly the row-group
    statistics a scan consults before reading pages. Map-side chunk
    tag + one month-granular aggregate; at 100 TB this is the metadata
    pass that turns a full scan into a tail scan."""
    li = load_table(spark, sf_dir, "lineitem")
    zm = li.groupBy(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("bigint")
        .alias("chunk")
    ).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )
    return zm.select(
        "chunk",
        "n_rows",
        "min_ship",
        "max_ship",
        (F.col("max_ship") < F.lit(ZM_PRED_DATE).cast("date")).alias("prunable"),
    )


@register(
    "seasonal_decompose_revenue",
    sql="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY 1
    ),
    tr AS (
      SELECT day, rev,
             round(avg(rev) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 2) AS trend,
             CAST((day - DATE '1990-01-01') % 7 AS BIGINT) AS wd
      FROM daily
    ),
    sr AS (
      SELECT wd, round(avg(rev - trend), 2) AS s_raw
      FROM tr GROUP BY wd
    ),
    ctr AS (SELECT round(avg(s_raw), 2) AS s_mean FROM sr)
    SELECT t.day, t.rev, t.trend,
           round(s.s_raw - c.s_mean, 2) AS seasonal,
           round(t.rev - t.trend - (s.s_raw - c.s_mean), 2) AS resid
    FROM tr t JOIN sr s ON t.wd = s.wd CROSS JOIN ctr c
    """,
)
def seasonal_decompose_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R165 classical seasonal decomposition (trend + seasonal +
    residual) of daily order revenue: trend is a centered 7-day moving
    average, the seasonal component is the weekday mean of the
    detrended series re-centered to zero, residual is the rest — the
    moving-average decomposition behind STL's initial pass. The window
    runs over the DAY-LEVEL pre-aggregate (calendar-bounded, ~2.4k
    rows at any SF — same waiver class as range_frame_rolling_revenue);
    the seasonal join is a 7-row broadcast. Weekday via datediff%7
    from a pre-range anchor (engine-portable, no dow() mismatch)."""
    from pyspark.sql import Window

    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "rev",
        F.round(F.avg("rev").over(w), 2).alias("trend"),
        (F.datediff("day", F.lit("1990-01-01").cast("date")) % 7)
        .cast("bigint")
        .alias("wd"),
    )
    sr = tr.groupBy("wd").agg(
        F.round(F.avg(F.col("rev") - F.col("trend")), 2).alias("s_raw")
    )
    ctr = sr.agg(F.round(F.avg("s_raw"), 2).alias("s_mean"))
    return (
        tr.join(F.broadcast(sr), on="wd")
        .crossJoin(F.broadcast(ctr))
        .select(
            "day",
            "rev",
            "trend",
            F.round(F.col("s_raw") - F.col("s_mean"), 2).alias("seasonal"),
            F.round(
                F.col("rev") - F.col("trend") - (F.col("s_raw") - F.col("s_mean")),
                2,
            ).alias("resid"),
        )
    )


LIFT_DECILES = 10


@register(
    "lift_gains_deciles",
    sql=f"""
    WITH cust AS (
      SELECT o_custkey AS custkey,
             round(sum(o_totalprice), 2) AS score,
             max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS label
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT custkey, score, label,
             row_number() OVER (ORDER BY score DESC, custkey) AS rn,
             count(*) OVER () AS n
      FROM cust
    ),
    dec AS (
      SELECT CAST(floor((rn - 1) * {LIFT_DECILES} * 1.0 / n) AS BIGINT) + 1
               AS decile,
             label
      FROM ranked
    ),
    per AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(label) AS BIGINT) AS n_pos
      FROM dec GROUP BY decile
    ),
    tot AS (
      SELECT CAST(sum(n_rows) AS BIGINT) AS tn,
             CAST(sum(n_pos) AS BIGINT) AS tp
      FROM per
    )
    SELECT a.decile, a.n_rows, a.n_pos,
           CAST(sum(b.n_rows) AS BIGINT) AS cum_rows,
           CAST(sum(b.n_pos) AS BIGINT) AS cum_pos,
           round(CAST(sum(b.n_pos) AS DOUBLE) / t.tp, 6) AS gain,
           round((CAST(sum(b.n_pos) AS DOUBLE) / sum(b.n_rows))
                 / (CAST(t.tp AS DOUBLE) / t.tn), 6) AS lift
    FROM per a JOIN per b ON b.decile <= a.decile CROSS JOIN tot t
    GROUP BY a.decile, a.n_rows, a.n_pos, t.tp, t.tn
    """,
)
def lift_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R166 lift & cumulative-gains table: customers ranked by spend
    (the model-score proxy), label = ever placed an URGENT order;
    per score-decile the positive count, cumulative gain (share of all
    positives captured) and lift vs the base rate — the targeting
    curve every campaign/model report ships. The global rank uses the
    two-phase `global_row_number` (range shuffle + O(P) offsets), NOT
    a single-task window; deciles come from integer arithmetic on the
    rank; the cumulative step is a {LIFT_DECILES}x{LIFT_DECILES}
    self-join on the tiny per-decile aggregate (no window at all)."""
    from zoom_spark.operators.prefix import global_row_number

    od = load_table(spark, sf_dir, "orders")
    cust = od.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("score"),
        F.max(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("label"),
    )
    ranked = global_row_number(
        cust.withColumn("neg_score", -F.col("score")),
        ["neg_score", "custkey"],
        out_col="rn",
    ).drop("neg_score")
    n_total = cust.count()
    dec = ranked.select(
        (
            F.floor((F.col("rn") - 1) * LIFT_DECILES / F.lit(n_total)) + 1
        )
        .cast("bigint")
        .alias("decile"),
        "label",
    )
    per = dec.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("label").cast("bigint").alias("n_pos"),
    )
    tot = per.agg(
        F.sum("n_rows").cast("bigint").alias("tn"),
        F.sum("n_pos").cast("bigint").alias("tp"),
    )
    a, b = per.alias("a"), per.alias("b")
    return (
        a.join(F.broadcast(b), F.col("b.decile") <= F.col("a.decile"))
        .crossJoin(F.broadcast(tot))
        .groupBy(
            F.col("a.decile").alias("decile"),
            F.col("a.n_rows").alias("n_rows"),
            F.col("a.n_pos").alias("n_pos"),
            F.col("tp"),
            F.col("tn"),
        )
        .agg(
            F.sum("b.n_rows").cast("bigint").alias("cum_rows"),
            F.sum("b.n_pos").cast("bigint").alias("cum_pos"),
            F.round(
                F.sum("b.n_pos").cast("double") / F.first("tp"), 6
            ).alias("gain"),
            F.round(
                (F.sum("b.n_pos").cast("double") / F.sum("b.n_rows"))
                / (F.first("tp").cast("double") / F.first("tn")),
                6,
            ).alias("lift"),
        )
        .select(
            "decile", "n_rows", "n_pos", "cum_rows", "cum_pos", "gain", "lift"
        )
    )


K_ANON = 5
L_DIV = 2


@register(
    "k_anonymity_report",
    sql=f"""
    SELECT c_nationkey,
           c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT substring(c_name, length(c_name), 1))
                AS BIGINT) AS l_div,
           (count(*) < {K_ANON}) AS k_risky,
           (count(DISTINCT substring(c_name, length(c_name), 1)) < {L_DIV})
             AS l_risky
    FROM customer
    GROUP BY 1, 2, 3
    """,
)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R167 k-anonymity / l-diversity audit: group customers by their
    quasi-identifier tuple (nation, segment, generalized account-
    balance bucket) and flag equivalence classes smaller than k={K_ANON}
    (re-identifiable) or whose sensitive attribute (a phone digit as
    the stand-in) shows fewer than l={L_DIV} distinct values
    (attribute-disclosure risk) — the Sweeney/Machanavajjhala checks a
    release pipeline runs before publishing microdata. The sensitive
    attribute stand-in is the last digit of c_name (the fixture has no
    phone column). One hash aggregate on the QI key; count(DISTINCT)
    is per-group so the distinct set is class-sized, not table-sized."""
    c = load_table(spark, sf_dir, "customer")
    sens = F.expr("substring(c_name, length(c_name), 1)")
    return c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_bucket"),
    ).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct(sens).cast("bigint").alias("l_div"),
        (F.count("*") < K_ANON).alias("k_risky"),
        (F.countDistinct(sens) < L_DIV).alias("l_risky"),
    )


DP_SCALE = 268435456.0  # 16^7: md5 7-hex-digit prefix -> uniform [0,1)


@register(
    "dp_noisy_counts",
    sql=f"""
    WITH g AS (
      SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_true
      FROM customer GROUP BY 1
    ),
    u AS (
      SELECT segment, n_true,
             round(CAST(CAST('0x' || substring(md5(segment), 1, 7) AS BIGINT)
                   AS DOUBLE) / {DP_SCALE}, 9) AS unif
      FROM g
    )
    SELECT segment, n_true,
           round(CASE WHEN unif < 0.5
                 THEN ln(greatest(2 * unif, 1e-12))
                 ELSE -ln(greatest(2 * (1 - unif), 1e-12)) END, 4)
             AS noise,
           round(n_true + CASE WHEN unif < 0.5
                 THEN ln(greatest(2 * unif, 1e-12))
                 ELSE -ln(greatest(2 * (1 - unif), 1e-12)) END, 4)
             AS n_noisy
    FROM u
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R168 differential-privacy noisy counts (epsilon=1 Laplace
    mechanism, sensitivity 1): per-segment counts plus Laplace(1)
    noise drawn by inverse-CDF from a uniform derived from md5 of the
    group key — a deterministic, engine-portable noise source (the
    seeded-RNG pattern; a production release would use a CSPRNG, but
    the mechanism, sensitivity accounting, and inverse-CDF transform
    are exactly these expressions). The uniform is rounded to 9dp on
    BOTH engines before ln so the transcendental sees identical
    arguments (repo rounding discipline). Map-side hash agg; noise is
    per-group scalar arithmetic."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").cast("bigint").alias("n_true")
    )
    unif = F.round(
        F.conv(F.substring(F.md5("segment"), 1, 7), 16, 10).cast("double")
        / DP_SCALE,
        9,
    )
    u = g.select("segment", "n_true", unif.alias("unif"))
    noise = F.when(
        F.col("unif") < 0.5,
        F.log(F.greatest(2 * F.col("unif"), F.lit(1e-12))),
    ).otherwise(
        -F.log(F.greatest(2 * (1 - F.col("unif")), F.lit(1e-12)))
    )
    return u.select(
        "segment",
        "n_true",
        F.round(noise, 4).alias("noise"),
        F.round(F.col("n_true") + noise, 4).alias("n_noisy"),
    )

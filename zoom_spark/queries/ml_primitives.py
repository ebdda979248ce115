"""Distributed ML training primitives (R206+): exact decision-stump
split finding — the inner loop of every distributed tree learner
(XGBoost/LightGBM-style histogram splitters approximate exactly this).

Scale shape: rows collapse to per-distinct-feature-value (count,
positives) in one hash aggregate; running counts come from the
two-phase prefix scan (range shuffle + O(P) offsets — no single-task
window in the Spark plan); every candidate threshold's information
gain is then a pure expression over exact integer counts, and the
argmax is a k=1 TakeOrdered. Entropies consume exact-integer
quotients, so both engines feed ln() identical doubles (the KM
precedent).

No analog in the reference connector (SURVEY.md §2.11 extension
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.queries import register

# entropy helper fragments shared textually by both engines:
# H(p) with 0*ln(0) -> 0 guarded via CASE


@register(
    "decision_stump_acctbal",
    sql="""
    WITH lab AS (
      SELECT c.c_custkey, c.c_acctbal AS v,
             CASE WHEN u.k IS NULL THEN 0 ELSE 1 END AS y
      FROM customer c
      LEFT JOIN (SELECT DISTINCT o_custkey AS k FROM orders
                 WHERE o_orderpriority = '1-URGENT') u
        ON u.k = c.c_custkey
    ),
    pv AS (
      SELECT v, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(y) AS BIGINT) AS pos
      FROM lab GROUP BY v
    ),
    cum AS (
      SELECT v,
             sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS nl,
             sum(pos) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS pl
      FROM pv
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
                   CAST(sum(pos) AS BIGINT) AS p FROM pv),
    cand AS (
      -- split "x <= v": left = cum counts, right = total - left;
      -- exclude the degenerate full-table split
      SELECT c.v, c.nl, c.pl, t.n, t.p,
             t.n - c.nl AS nr, t.p - c.pl AS pr
      FROM cum c CROSS JOIN tot t
      WHERE c.nl < t.n
    ),
    gain AS (
      SELECT v, nl, nr,
             round(
               (CASE WHEN p > 0 AND p < n THEN
                  -(p * 1.0 / n) * ln(p * 1.0 / n)
                  - (1 - p * 1.0 / n) * ln(1 - p * 1.0 / n)
                ELSE 0.0 END)
               - (nl * 1.0 / n) *
                 (CASE WHEN pl > 0 AND pl < nl THEN
                    -(pl * 1.0 / nl) * ln(pl * 1.0 / nl)
                    - (1 - pl * 1.0 / nl) * ln(1 - pl * 1.0 / nl)
                  ELSE 0.0 END)
               - (nr * 1.0 / n) *
                 (CASE WHEN pr > 0 AND pr < nr THEN
                    -(pr * 1.0 / nr) * ln(pr * 1.0 / nr)
                    - (1 - pr * 1.0 / nr) * ln(1 - pr * 1.0 / nr)
                  ELSE 0.0 END), 9) AS info_gain
      FROM cand
    )
    SELECT v AS threshold, CAST(nl AS BIGINT) AS n_left,
           CAST(nr AS BIGINT) AS n_right,
           round(info_gain, 6) AS info_gain
    FROM gain
    ORDER BY info_gain DESC, v ASC
    LIMIT 1
    """,
)
def decision_stump_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R206 exact decision-stump learner: the single best
    information-gain split of account balance predicting "customer
    has an URGENT order" — the inner loop of distributed tree
    training. One label join + one per-distinct-value aggregate, the
    two-phase prefix scan for running (count, positive) pairs, a pure
    expression for every candidate's entropy gain over exact integer
    quotients, and a k=1 TakeOrdered for the argmax (gain desc,
    threshold asc tie-break). At 100 TB this is exactly the
    histogram-splitter shape, with the exact-value histogram standing
    in for the binned one."""
    from zoom_spark.operators.prefix import prefix_sum

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    urgent = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    lab = c.join(
        F.broadcast(urgent), c["c_custkey"] == urgent["k"], "left"
    ).select(
        F.col("c_acctbal").alias("v"),
        F.when(F.col("k").isNull(), 0).otherwise(1).alias("y"),
    )
    pv = lab.groupBy("v").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    cum = prefix_sum(pv, "v", "cnt", out_col="nl")
    cum = prefix_sum(cum, "v", "pos", out_col="pl")
    tot = pv.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("p"),
    )
    cand = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("nl") < F.col("n"))
        .select(
            "v",
            "nl",
            "pl",
            "n",
            "p",
            (F.col("n") - F.col("nl")).alias("nr"),
            (F.col("p") - F.col("pl")).alias("pr"),
        )
    )

    def ent(p_col, n_col):
        frac = p_col * 1.0 / n_col
        return F.when(
            (p_col > 0) & (p_col < n_col),
            -frac * F.log(frac) - (1 - frac) * F.log(1 - frac),
        ).otherwise(0.0)

    gain = cand.select(
        "v",
        "nl",
        "nr",
        F.round(
            ent(F.col("p"), F.col("n"))
            - (F.col("nl") * 1.0 / F.col("n")) * ent(F.col("pl"), F.col("nl"))
            - (F.col("nr") * 1.0 / F.col("n")) * ent(F.col("pr"), F.col("nr")),
            9,
        ).alias("info_gain"),
    )
    return (
        gain.orderBy(F.col("info_gain").desc(), F.col("v").asc())
        .limit(1)
        .select(
            F.col("v").alias("threshold"),
            F.col("nl").cast("bigint").alias("n_left"),
            F.col("nr").cast("bigint").alias("n_right"),
            F.round("info_gain", 6).alias("info_gain"),
        )
    )

"""Round-5 statistical / curation-split operators (R69-R74).

Warehouse statistics and training-data plumbing beyond the round-4
registry: chi-square independence testing, Jensen-Shannon divergence
between source token distributions (the data-mixing drift diagnostic),
deterministic train/val/test splitting, RFM customer quintiles built on
the repo's distributed global-rank primitive, n-gram novelty scoring,
and a two-proportion A/B z-test.

All are DataFrame-first with exact DuckDB oracle twins; hash
pseudo-randomness uses the repo's md5-prefix idiom and every float
aggregate is rounded on both sides before compare.

Reference parity note: the reference pipeline (/root/reference/main.py)
has no analog for any of these — they are part of the mandated
LLM-pipeline / warehouse extension family (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.queries import register


@register(
    "chi_square_independence",
    sql="""
    WITH cells AS (
      SELECT event_type AS et,
             CAST((CAST(ts AS DATE) - DATE '2024-01-01') % 7 AS BIGINT) AS wd,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT sum(n) AS n_tot FROM cells),
    rowt AS (SELECT et, sum(n) AS rn FROM cells GROUP BY et),
    colt AS (SELECT wd, sum(n) AS cn FROM cells GROUP BY wd)
    -- observed-cell sum + the structural-zero correction: every
    -- missing (et, wd) cell contributes its full expectation e, and
    -- sum(e) over ALL cells is n_tot, so the missing mass is
    -- n_tot - sum(e over observed cells)
    SELECT round(sum(pow(c.n - r.rn * co.cn / t.n_tot, 2)
                     / (r.rn * co.cn / t.n_tot))
                 + (any_value(t.n_tot)
                    - sum(r.rn * co.cn / t.n_tot)), 6) AS chi2,
           CAST((count(DISTINCT c.et) - 1) * (count(DISTINCT c.wd) - 1)
                AS BIGINT) AS dof,
           CAST(sum(c.n) AS BIGINT) AS n
    FROM cells c
    JOIN rowt r USING (et)
    JOIN colt co USING (wd)
    CROSS JOIN tot t
    """,
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and
    day-of-week (is user behavior day-dependent?). One hash aggregate
    reduces the stream to the contingency table — category-count-sized
    (|types| x 7 cells), NOT data-sized — and every subsequent join
    (row totals, column totals, the 1-row grand total) is a broadcast
    over that tiny frame. At 100 TB the only full-data pass is the
    first partial-aggregated groupBy."""
    ev = load_table(spark, sf_dir, "events")
    wd = (
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        % 7
    ).cast("bigint")
    cells = (
        ev.select(F.col("event_type").alias("et"), wd.alias("wd"))
        .groupBy("et", "wd")
        .agg(F.count("*").cast("double").alias("n"))
    )
    rowt = cells.groupBy("et").agg(F.sum("n").alias("rn"))
    colt = cells.groupBy("wd").agg(F.sum("n").alias("cn"))
    tot = cells.agg(F.sum("n").alias("n_tot"))
    e = F.col("rn") * F.col("cn") / F.col("n_tot")
    return (
        cells.join(F.broadcast(rowt), "et")
        .join(F.broadcast(colt), "wd")
        .crossJoin(F.broadcast(tot))
        .agg(
            # observed-cell sum + structural-zero correction (missing
            # cells contribute their full expectation; sum(e) over ALL
            # cells is n_tot, so the missing mass is n_tot - sum(e))
            F.round(
                F.sum(F.pow(F.col("n") - e, 2) / e)
                + (F.first("n_tot") - F.sum(e)),
                6,
            ).alias("chi2"),
            (
                (F.countDistinct("et") - 1) * (F.countDistinct("wd") - 1)
            ).cast("bigint").alias("dof"),
            F.sum("n").cast("bigint").alias("n"),
        )
    )


@register(
    "js_divergence_sources",
    sql="""
    WITH toks AS (
      SELECT d.source, t.tok FROM documents d
      CROSS JOIN LATERAL (SELECT unnest(string_split(d.text, ' ')) AS tok) t
      WHERE t.tok <> ''
    ),
    st AS (
      SELECT source, tok, CAST(count(*) AS DOUBLE) AS c
      FROM toks GROUP BY 1, 2
    ),
    s_tot AS (SELECT source, sum(c) AS ns FROM st GROUP BY source),
    t_tot AS (SELECT tok, sum(c) AS ct FROM st GROUP BY tok),
    g AS (SELECT sum(c) AS n FROM st),
    terms AS (
      SELECT st.source,
             st.c / s.ns AS p,
             (tt.ct - st.c) / (g.n - s.ns) AS q
      FROM st
      JOIN s_tot s USING (source)
      JOIN t_tot tt USING (tok)
      CROSS JOIN g
    )
    SELECT source,
           round((0.5 * sum(p * ln(2.0 * p / (p + q))
                            + CASE WHEN q > 0
                                   THEN q * ln(2.0 * q / (p + q))
                                   ELSE 0.0 END)
                  + 0.5 * ln(2.0) * (1.0 - sum(q))) / ln(2.0), 6)
             AS js_bits
    FROM terms GROUP BY source
    """,
)
def js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (in bits) between each source's
    unigram token distribution and the rest of the corpus — the
    standard drift/mixing diagnostic for multi-source training data.

    Tokens absent from a source contribute q*ln2 to the divergence;
    rather than materialize the |vocab| x |sources| dense grid, those
    terms are folded in closed form via ln2 * (1 - sum of q over the
    source's PRESENT tokens), so the joined frame stays at observed
    (source, token) pairs only. Scale shape: one token-explode pass,
    hash aggregates on (source, token) and token, a token-keyed
    equi-join, and broadcastable source totals; per-source term sums
    are rounded to 6dp on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count("*").cast("double").alias("c"))
    )
    s_tot = st.groupBy("source").agg(F.sum("c").alias("ns"))
    t_tot = st.groupBy("tok").agg(F.sum("c").alias("ct"))
    g = st.agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("ns")
    q = (F.col("ct") - F.col("c")) / (F.col("n") - F.col("ns"))
    terms = (
        st.join(F.broadcast(s_tot), "source")
        .join(t_tot, "tok")
        .crossJoin(F.broadcast(g))
        .select("source", p.alias("p"), q.alias("q"))
    )
    pq = F.col("p") + F.col("q")
    present = F.col("p") * F.log(2.0 * F.col("p") / pq) + F.when(
        F.col("q") > 0, F.col("q") * F.log(2.0 * F.col("q") / pq)
    ).otherwise(0.0)
    ln2 = F.log(F.lit(2.0))
    return terms.groupBy("source").agg(
        F.round(
            (0.5 * F.sum(present) + 0.5 * ln2 * (1.0 - F.sum("q"))) / ln2, 6
        ).alias("js_bits")
    )


@register(
    "train_val_test_split",
    sql="""
    WITH assigned AS (
      SELECT source,
             CASE WHEN b < 80 THEN 'train'
                  WHEN b < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT source,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 100 AS b
        FROM documents
      )
    )
    SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*) * 1.0
                 / sum(count(*)) OVER (PARTITION BY source), 4) AS frac
    FROM assigned GROUP BY source, split
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by md5(doc_id)
    bucket — the reproducible, join-free holdout assignment every
    training pipeline needs (a doc's split never changes as the corpus
    grows, unlike rand() or ntile). The assignment is map-only; the
    audit output is one hash aggregate on (source, split) plus a
    window over the <=3-rows-per-source aggregate. Engine-portable:
    md5-prefix bucket, identical in DuckDB."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    b = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint"),
        F.lit(100),
    )
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    ).alias("split")
    w = Window.partitionBy("source")
    return (
        docs.select("source", split)
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"))
        .withColumn(
            "frac",
            F.round(F.col("n_docs") * 1.0 / F.sum("n_docs").over(w), 4),
        )
        .select("source", "split", F.col("n_docs").cast("bigint").alias("n_docs"), "frac")
    )


@register(
    "rfm_scores",
    sql="""
    WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS d0 FROM orders),
    per_c AS (
      SELECT o_custkey AS c_custkey,
             CAST(count(*) AS BIGINT) AS frequency,
             round(sum(o_totalprice), 2) AS monetary,
             max(CAST(o_orderdate AS DATE)) AS last_d
      FROM orders GROUP BY o_custkey
    ),
    base AS (
      SELECT c_custkey, frequency, monetary,
             CAST(d0 - last_d AS BIGINT) AS recency_days,
             count(*) OVER () AS n
      FROM per_c CROSS JOIN ref
    ),
    ranked AS (
      SELECT c_custkey, recency_days, frequency, monetary, n,
             row_number() OVER (ORDER BY recency_days, c_custkey) AS rn_r,
             row_number() OVER (ORDER BY frequency, c_custkey) AS rn_f,
             row_number() OVER (ORDER BY monetary, c_custkey) AS rn_m
      FROM base
    )
    SELECT c_custkey, recency_days, frequency, monetary,
           CAST(floor((rn_r - 1) * 5 / n) + 1 AS BIGINT) AS r_q,
           CAST(floor((rn_f - 1) * 5 / n) + 1 AS BIGINT) AS f_q,
           CAST(floor((rn_m - 1) * 5 / n) + 1 AS BIGINT) AS m_q
    FROM ranked
    """,
)
def rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency / frequency / monetary
    quintiles (quintile 5 = highest value: most days stale, most
    orders, most spend). The quintile is the explicit rank formula
    floor((rank-1)*5/n)+1 over the repo's ``global_row_number``
    primitive — range-partition + local rank + O(P) broadcast offsets —
    so no customer-sized frame ever funnels through a single-task
    window (the oracle's row_number() is the semantic spec, not the
    plan). Ties break on c_custkey; monetary is rounded to 2dp BEFORE
    ranking so both engines order identically."""
    from zoom_spark.operators.prefix import global_row_number

    o = load_table(spark, sf_dir, "orders")
    ref = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("d0"))
    per_c = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count("*").cast("bigint").alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "c_custkey",
            "frequency",
            "monetary",
            F.datediff("d0", "last_d").cast("bigint").alias("recency_days"),
        )
        .localCheckpoint(eager=False)
    )
    n = per_c.count()
    ranked = global_row_number(per_c, ["recency_days", "c_custkey"], "rn_r")
    ranked = global_row_number(ranked, ["frequency", "c_custkey"], "rn_f")
    ranked = global_row_number(ranked, ["monetary", "c_custkey"], "rn_m")

    def quintile(rn: str):
        return (
            F.floor((F.col(rn) - 1) * 5 / F.lit(n)) + 1
        ).cast("bigint")

    return ranked.select(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary",
        quintile("rn_r").alias("r_q"),
        quintile("rn_f").alias("f_q"),
        quintile("rn_m").alias("m_q"),
    )


NOV_W = 3


@register(
    "novelty_ngram_score",
    sql=f"""
    WITH words AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    shingles AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(ws[t.i:t.i + {NOV_W - 1}], ' ')) AS sh
      FROM words
      CROSS JOIN LATERAL (
        SELECT unnest(generate_series(1, len(ws) - {NOV_W - 1})) AS i
      ) t
      WHERE len(ws) >= {NOV_W}
    ),
    df AS (
      SELECT sh, CAST(count(*) AS BIGINT) AS n_docs
      FROM shingles GROUP BY sh
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           round(count(*) FILTER (WHERE df.n_docs = 1) * 1.0 / count(*), 6)
             AS novelty
    FROM shingles s JOIN df USING (sh)
    GROUP BY s.doc_id
    """,
)
def novelty_ngram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    word {NOV_W}-grams that appear in NO other document — the inverse
    of the memorization/duplication risk score used to prioritize
    novel data in curation. Shingles are md5-hashed map-side so the
    two hash shuffles (doc-distinct, then shingle document-frequency)
    move 16-byte keys, never text; the join back to per-doc shingles
    is equi on the hash. No doc-vs-doc join ever happens."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    shingles = (
        docs.select("doc_id", ws.alias("ws"))
        .where(F.size("ws") >= NOV_W)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.size("ws") - (NOV_W - 1), F.lit(1))
            ).alias("i"),
            "ws",
        )
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(" ", F.slice(F.col("ws"), F.col("i"), NOV_W))
            ).alias("sh"),
        )
        .distinct()
    )
    df_counts = shingles.groupBy("sh").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    return (
        shingles.join(df_counts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.round(
                F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0))
                * 1.0
                / F.count("*"),
                6,
            ).alias("novelty"),
        )
    )


@register(
    "ab_test_proportions",
    sql="""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS grp,
             CASE WHEN round(avg(CASE WHEN event_type = 'purchase'
                                      THEN value END), 6) > 38.0
                  THEN 1 ELSE 0 END AS conv
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(count(*) FILTER (WHERE grp = 0) AS BIGINT) AS n_a,
             CAST(count(*) FILTER (WHERE grp = 1) AS BIGINT) AS n_b,
             CAST(sum(conv) FILTER (WHERE grp = 0) AS BIGINT) AS conv_a,
             CAST(sum(conv) FILTER (WHERE grp = 1) AS BIGINT) AS conv_b
      FROM per_user
    )
    SELECT n_a, n_b, conv_a, conv_b,
           round(conv_a * 1.0 / n_a, 6) AS p_a,
           round(conv_b * 1.0 / n_b, 6) AS p_b,
           round((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
                 / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 4) AS z
    FROM s
    """,
)
def ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on user conversion (is the user's mean
    purchase value above the population center?) between a
    deterministic A/B assignment (user_id parity) — the
    experimentation-platform readout. The metric is rate-based (mean,
    not ever-did-X) so it stays non-degenerate as events-per-user
    grows with scale; the mean is rounded to 6dp before thresholding
    so both engines classify identically. Two hash aggregates: the
    user collapse (data-sized, partial-aggregated) and the 1-row
    pooled summary; the z statistic is computed from four scalars in
    the final projection. No joins, no windows."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.when(
            F.round(
                F.avg(
                    F.when(F.col("event_type") == "purchase", F.col("value"))
                ),
                6,
            )
            > 38.0,
            1,
        )
        .otherwise(0)
        .alias("conv")
    ).withColumn("grp", F.col("user_id") % 2)
    s = per_user.agg(
        F.count(F.when(F.col("grp") == 0, 1)).cast("bigint").alias("n_a"),
        F.count(F.when(F.col("grp") == 1, 1)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("grp") == 0, F.col("conv"))).cast("bigint").alias("conv_a"),
        F.sum(F.when(F.col("grp") == 1, F.col("conv"))).cast("bigint").alias("conv_b"),
    )
    p_a = F.col("conv_a") * 1.0 / F.col("n_a")
    p_b = F.col("conv_b") * 1.0 / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) * 1.0 / (
        F.col("n_a") + F.col("n_b")
    )
    z = (p_a - p_b) / F.sqrt(
        pool * (1.0 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return s.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(z, 4).alias("z"),
    )

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

from pyspark.sql import DataFrame, SparkSession, Window
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


BLOOM_M = 8192  # bits
BLOOM_K = 3  # hash functions (md5 hex slices)


def _bloom_pos_sql(col: str, i: int) -> str:
    return (
        f"CAST('0x' || substring(md5(CAST({col} AS VARCHAR)), {1 + 6 * i}, 6) "
        f"AS BIGINT) % {BLOOM_M}"
    )


@register(
    "bloom_filter_join_stats",
    sql=f"""
    WITH build AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    bits AS (
      SELECT DISTINCT pos FROM (
        {" UNION ALL ".join(
            f"SELECT {_bloom_pos_sql('c_custkey', i)} AS pos FROM build"
            for i in range(BLOOM_K)
        )}
      )
    ),
    probe AS (SELECT DISTINCT o_custkey AS k FROM orders),
    probed AS (
      SELECT p.k, count(b.pos) AS nbits
      FROM probe p
      CROSS JOIN LATERAL (
        {" UNION ALL ".join(
            f"SELECT {_bloom_pos_sql('p.k', i)} AS pos"
            for i in range(BLOOM_K)
        )}
      ) h
      LEFT JOIN bits b ON b.pos = h.pos
      GROUP BY p.k
    ),
    truth AS (SELECT c_custkey AS k FROM build),
    fused AS (
      SELECT p.k, (p.nbits = {BLOOM_K}) AS bloom_pass,
             (t.k IS NOT NULL) AS truly_in
      FROM probed p LEFT JOIN truth t ON p.k = t.k
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probed,
           CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass,
           CAST(sum(CASE WHEN truly_in THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true,
           CAST(sum(CASE WHEN bloom_pass AND NOT truly_in THEN 1 ELSE 0 END)
             AS BIGINT) AS n_false_pos,
           CAST(sum(CASE WHEN NOT bloom_pass AND truly_in THEN 1 ELSE 0 END)
             AS BIGINT) AS n_false_neg,
           round(CAST(sum(CASE WHEN bloom_pass AND NOT truly_in THEN 1
                          ELSE 0 END) AS DOUBLE)
                 / greatest(count(*) - sum(CASE WHEN truly_in THEN 1
                                           ELSE 0 END), 1), 6) AS fp_rate
    FROM fused
    """,
)
def bloom_filter_join_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R169 Bloom-filter join pruning, made inspectable: build an
    m={BLOOM_M}-bit k={BLOOM_K}-hash Bloom filter from the dimension
    side (BUILDING customers), probe every distinct orders customer,
    and report pass/true/false-positive counts and the FP rate — the
    runtime-filter mechanic behind Spark's own
    spark.sql.optimizer.runtime.bloomFilter (which the engine also
    enables), with md5 slice hashing so the oracle builds the
    bit-identical filter. The filter is a DISTINCT-positions frame
    (≤m rows) joined to probe positions — set-semantics Bloom, no
    bitmap type needed; zero false negatives by construction (asserted
    by the n_false_neg column)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")

    def pos(col, i):
        return (
            F.conv(
                F.substring(F.md5(F.col(col).cast("string")), 1 + 6 * i, 6),
                16,
                10,
            ).cast("bigint")
            % BLOOM_M
        )

    build = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    bits = None
    for i in range(BLOOM_K):
        part = build.select(pos("c_custkey", i).alias("pos"))
        bits = part if bits is None else bits.unionAll(part)
    bits = bits.distinct()
    probe = o.select(F.col("o_custkey").alias("k")).distinct()
    hashes = None
    for i in range(BLOOM_K):
        part = probe.select("k", pos("k", i).alias("pos"))
        hashes = part if hashes is None else hashes.unionAll(part)
    probed = (
        hashes.join(F.broadcast(bits.withColumn("_hit", F.lit(1))), on="pos", how="left")
        .groupBy("k")
        .agg(F.count("_hit").alias("nbits"))
    )
    truth = build.select(F.col("c_custkey").alias("k")).withColumn(
        "_in", F.lit(1)
    )
    fused = probed.join(truth, on="k", how="left").select(
        (F.col("nbits") == BLOOM_K).alias("bloom_pass"),
        F.col("_in").isNotNull().alias("truly_in"),
    )
    return fused.agg(
        F.count("*").cast("bigint").alias("n_probed"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
        F.sum(F.when(F.col("truly_in"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_true"),
        F.sum(F.when(F.col("bloom_pass") & ~F.col("truly_in"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_pos"),
        F.sum(F.when(~F.col("bloom_pass") & F.col("truly_in"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_neg"),
        F.round(
            F.sum(
                F.when(F.col("bloom_pass") & ~F.col("truly_in"), 1).otherwise(0)
            ).cast("double")
            / F.greatest(
                F.count("*")
                - F.sum(F.when(F.col("truly_in"), 1).otherwise(0)),
                F.lit(1),
            ),
            6,
        ).alias("fp_rate"),
    )


NB_SMOOTH = 1  # Laplace add-one


@register(
    "naive_bayes_source_classifier",
    sql=f"""
    WITH docs AS (
      SELECT doc_id, source,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
      FROM documents
    ),
    train AS (SELECT * FROM docs WHERE doc_id % 2 = 0),
    test  AS (SELECT * FROM docs WHERE doc_id % 2 = 1),
    tr_tok AS (
      SELECT source, unnest(ws) AS t FROM train
    ),
    cls_tok AS (
      SELECT source, t, CAST(count(*) AS BIGINT) AS c
      FROM tr_tok GROUP BY 1, 2
    ),
    cls_tot AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM cls_tok GROUP BY 1
    ),
    vocab AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM tr_tok),
    prior AS (
      SELECT source, CAST(count(*) AS BIGINT) AS nd FROM train GROUP BY 1
    ),
    n_train AS (SELECT CAST(count(*) AS BIGINT) AS n FROM train),
    te_tok AS (
      SELECT doc_id, source AS true_source, t, CAST(count(*) AS BIGINT) AS f
      FROM (SELECT doc_id, source, unnest(ws) AS t FROM test)
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT te.doc_id, te.true_source, ct.source AS cls,
             sum(te.f * ln((coalesce(k.c, 0) + {NB_SMOOTH})
                           / CAST(ct.tot + {NB_SMOOTH} * vb.v AS DOUBLE))) AS ll
      FROM te_tok te
      CROSS JOIN cls_tot ct
      CROSS JOIN vocab vb
      LEFT JOIN cls_tok k ON k.source = ct.source AND k.t = te.t
      GROUP BY 1, 2, 3
    ),
    full_score AS (
      SELECT s.doc_id, s.true_source, s.cls,
             round(s.ll + ln(p.nd / CAST(nt.n AS DOUBLE)), 6) AS score
      FROM scored s JOIN prior p ON p.source = s.cls CROSS JOIN n_train nt
    ),
    best AS (
      SELECT doc_id, true_source, cls AS pred_source,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, cls) AS rk
      FROM full_score
    )
    SELECT doc_id, true_source, pred_source FROM best WHERE rk = 1
    """,
)
def naive_bayes_source_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R170 multinomial Naive Bayes, trained AND applied distributed:
    fit per-source token log-likelihoods with add-one smoothing on the
    even-doc_id half, predict the source of each odd-doc_id document
    via argmax of sum(f * ln P(t|c)) + ln P(c). Training is one
    (source, token) aggregate; the model frames (class totals, priors,
    vocab size) are broadcast; scoring joins test tokens against the
    count table per class so unseen tokens fall back to the smoothed
    floor via the left join. The per-doc argmax window partitions on
    doc_id (high cardinality — never single-task). Scores are rounded
    to 6dp on both engines before the argmax so ulp-level ln noise
    can't flip the winner."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("ws"),
    )
    train = docs.where(F.col("doc_id") % 2 == 0)
    test = docs.where(F.col("doc_id") % 2 == 1)
    tr_tok = train.select("source", F.explode("ws").alias("t"))
    cls_tok = tr_tok.groupBy("source", "t").agg(
        F.count("*").cast("bigint").alias("c")
    )
    cls_tot = cls_tok.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("tot")
    )
    vocab = tr_tok.agg(F.countDistinct("t").cast("bigint").alias("v"))
    prior = train.groupBy("source").agg(
        F.count("*").cast("bigint").alias("nd")
    )
    n_train = train.agg(F.count("*").cast("bigint").alias("n"))
    te_tok = (
        test.select(
            "doc_id",
            F.col("source").alias("true_source"),
            F.explode("ws").alias("t"),
        )
        .groupBy("doc_id", "true_source", "t")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    scored = (
        te_tok.crossJoin(
            F.broadcast(cls_tot.select(F.col("source").alias("cls"), "tot"))
        )
        .crossJoin(F.broadcast(vocab))
        .join(
            cls_tok.select(
                F.col("source").alias("cls"), F.col("t"), F.col("c")
            ),
            on=["cls", "t"],
            how="left",
        )
        .groupBy("doc_id", "true_source", "cls")
        .agg(
            F.sum(
                F.col("f")
                * F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + NB_SMOOTH)
                    / (F.col("tot") + NB_SMOOTH * F.col("v")).cast("double")
                )
            ).alias("ll")
        )
    )
    full_score = (
        scored.join(
            F.broadcast(prior.select(F.col("source").alias("cls"), "nd")),
            on="cls",
        )
        .crossJoin(F.broadcast(n_train))
        .select(
            "doc_id",
            "true_source",
            "cls",
            F.round(
                F.col("ll") + F.log(F.col("nd") / F.col("n").cast("double")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cls")
    )
    return (
        full_score.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("doc_id", "true_source", F.col("cls").alias("pred_source"))
    )


CUPED_CUT = "1996-01-01"  # pre-period / experiment boundary


@register(
    "cuped_adjusted_ab",
    sql=f"""
    WITH per_cust AS (
      SELECT o_custkey,
             round(sum(CASE WHEN o_orderdate < DATE '{CUPED_CUT}'
                       THEN o_totalprice ELSE 0 END), 2) AS x,
             round(sum(CASE WHEN o_orderdate >= DATE '{CUPED_CUT}'
                       THEN o_totalprice ELSE 0 END), 2) AS y,
             CASE WHEN substring(md5(CAST(o_custkey AS VARCHAR)), 1, 1)
                       < '8' THEN 'treatment' ELSE 'control' END AS arm
      FROM orders GROUP BY o_custkey
    ),
    theta AS (
      SELECT round(covar_pop(x, y) / var_pop(x), 6) AS th,
             round(avg(x), 6) AS mx
      FROM per_cust
    )
    SELECT p.arm,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(p.y), 4) AS mean_y,
           round(avg(p.y - t.th * (p.x - t.mx)), 4) AS mean_y_cuped,
           round(stddev_pop(p.y), 2) AS sd_y,
           round(stddev_pop(p.y - t.th * (p.x - t.mx)), 2) AS sd_y_cuped
    FROM per_cust p CROSS JOIN theta t
    GROUP BY p.arm
    """,
)
def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R171 CUPED variance reduction (Deng et al., WSDM'13): adjust the
    experiment-period metric y with the pre-period covariate x via
    theta = cov(x,y)/var(x), reporting per-arm raw and adjusted means
    and standard deviations (stddev, not variance: at 1e11 magnitudes
    variance's last cent is summation-order noise) — the standard trick that cuts A/B test run time by
    the covariate's R². Arms are a deterministic md5 split (the
    engine-portable randomization unit); theta/mean(x) are a 1-row
    broadcast; everything else is decomposable aggregates — two passes
    over a per-customer frame, no windows, no sorts. x/y are
    2dp-rounded and theta 6dp-rounded on both engines before the
    adjusted-metric arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit(CUPED_CUT).cast("date")
    per_cust = o.groupBy("o_custkey").agg(
        F.round(
            F.sum(
                F.when(F.col("o_orderdate") < cut, F.col("o_totalprice"))
                .otherwise(0.0)
            ),
            2,
        ).alias("x"),
        F.round(
            F.sum(
                F.when(F.col("o_orderdate") >= cut, F.col("o_totalprice"))
                .otherwise(0.0)
            ),
            2,
        ).alias("y"),
    ).withColumn(
        "arm",
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1) < "8",
            "treatment",
        ).otherwise("control"),
    )
    theta = per_cust.agg(
        F.round(F.covar_pop("x", "y") / F.var_pop("x"), 6).alias("th"),
        F.round(F.avg("x"), 6).alias("mx"),
    )
    adj = F.col("y") - F.col("th") * (F.col("x") - F.col("mx"))
    return (
        per_cust.crossJoin(F.broadcast(theta))
        .groupBy("arm")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.avg("y"), 4).alias("mean_y"),
            F.round(F.avg(adj), 4).alias("mean_y_cuped"),
            F.round(F.stddev_pop("y"), 2).alias("sd_y"),
            F.round(F.stddev_pop(adj), 2).alias("sd_y_cuped"),
        )
    )


HT_P_BUILDING = 0.5  # inclusion probability, BUILDING stratum
HT_P_OTHER = 0.125  # inclusion probability, all other segments


@register(
    "horvitz_thompson_total",
    sql=f"""
    WITH spend AS (
      SELECT c.c_custkey, c.c_mktsegment,
             round(sum(o.o_totalprice), 2) AS y,
             CASE WHEN c.c_mktsegment = 'BUILDING'
                  THEN {HT_P_BUILDING} ELSE {HT_P_OTHER} END AS p,
             CAST(CAST('0x' || substring(
                    md5(CAST(c.c_custkey AS VARCHAR)), 1, 7) AS BIGINT)
                  AS DOUBLE) / 268435456.0 AS u
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_frame,
           CAST(sum(CASE WHEN u < p THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled,
           round(sum(CASE WHEN u < p THEN y / p ELSE 0 END), 2) AS ht_total,
           round(sum(y), 2) AS true_total,
           round(abs(sum(CASE WHEN u < p THEN y / p ELSE 0 END) - sum(y))
                 / sum(y), 6) AS rel_err
    FROM spend GROUP BY 1
    """,
)
def horvitz_thompson_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R172 Horvitz-Thompson estimation under unequal-probability
    sampling: customers are Bernoulli-sampled with a design that
    oversamples the BUILDING stratum ({HT_P_BUILDING} vs {HT_P_OTHER}),
    and the population spend total per segment is estimated as
    sum(y/p) over the sample — the inverse-inclusion-probability
    estimator every survey/telemetry pipeline uses when sampling rates
    differ by stratum. The sample membership is a deterministic
    md5-uniform (engine-portable); the report carries the true total
    and relative error so the estimator's unbiasedness is visible.
    One join + one aggregate; sampling is a map-side predicate."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("y"))
        .withColumn(
            "p",
            F.when(
                F.col("c_mktsegment") == "BUILDING", F.lit(HT_P_BUILDING)
            ).otherwise(F.lit(HT_P_OTHER)),
        )
        .withColumn(
            "u",
            F.conv(
                F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 7),
                16,
                10,
            ).cast("double")
            / 268435456.0,
        )
    )
    in_s = F.col("u") < F.col("p")
    return spend.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_frame"),
        F.sum(F.when(in_s, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
        F.round(
            F.sum(F.when(in_s, F.col("y") / F.col("p")).otherwise(0.0)), 2
        ).alias("ht_total"),
        F.round(F.sum("y"), 2).alias("true_total"),
        F.round(
            F.abs(
                F.sum(F.when(in_s, F.col("y") / F.col("p")).otherwise(0.0))
                - F.sum("y")
            )
            / F.sum("y"),
            6,
        ).alias("rel_err"),
    )


ERASE_PREFIX = "0"  # md5 prefix selecting ~1/16 of customers


@register(
    "gdpr_erasure_cascade",
    sql=f"""
    WITH req AS (
      SELECT c_custkey FROM customer
      WHERE substring(md5(CAST(c_custkey AS VARCHAR)), 1, 1)
            = '{ERASE_PREFIX}'
    ),
    ords AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM req)
    )
    SELECT * FROM (
      SELECT 'customer' AS table_name,
             CAST((SELECT count(*) FROM req) AS BIGINT) AS n_rows_to_delete
      UNION ALL
      SELECT 'orders', CAST((SELECT count(*) FROM ords) AS BIGINT)
      UNION ALL
      SELECT 'lineitem',
             CAST((SELECT count(*) FROM lineitem
                   WHERE l_orderkey IN (SELECT o_orderkey FROM ords))
                  AS BIGINT)
    )
    """,
)
def gdpr_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R173 right-to-erasure cascade plan: for a deterministic request
    set (~1/16 of customers via an md5 prefix — the stand-in for an
    uploaded DSAR list), count every row that a compliant delete must
    touch across the foreign-key graph (customer → orders → lineitem)
    — the blast-radius report a data-governance pipeline produces
    before executing the purge. Each hop is a broadcast LEFT SEMI join
    (the request set is DSAR-sized, orders-of-magnitude smaller than
    the fact tables), so at 100 TB the cascade is two semi joins + 3
    counts, never a shuffle of the big tables."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    req = c.where(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1)
        == ERASE_PREFIX
    ).select("c_custkey")
    ords = o.join(
        F.broadcast(req),
        o["o_custkey"] == req["c_custkey"],
        "left_semi",
    ).select("o_orderkey")
    lis = li.join(
        F.broadcast(ords),
        li["l_orderkey"] == ords["o_orderkey"],
        "left_semi",
    )

    def one(name, df):
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count("*").cast("bigint").alias("n_rows_to_delete"),
        )

    return (
        one("customer", req)
        .unionAll(one("orders", ords))
        .unionAll(one("lineitem", lis))
    )


RET_ANCHOR = "2022-01-03"  # pre-range anchor for day bucketing


@register(
    "retention_decay_fit",
    sql=f"""
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '{RET_ANCHOR}' AS BIGINT) AS wk
      FROM events
    ),
    first_wk AS (
      SELECT user_id, min(wk) AS cohort FROM act GROUP BY 1
    ),
    sizes AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
      FROM first_wk GROUP BY 1
    ),
    ret AS (
      SELECT f.cohort, a.wk - f.cohort AS offset_wk,
             CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
      FROM act a JOIN first_wk f ON a.user_id = f.user_id
      WHERE a.wk > f.cohort
      GROUP BY 1, 2
    ),
    rates AS (
      SELECT r.cohort, r.offset_wk,
             round(CAST(r.n_active AS DOUBLE) / s.n_users, 9) AS rate
      FROM ret r JOIN sizes s ON s.cohort = r.cohort
    ),
    fit AS (
      SELECT cohort,
             CAST(count(*) AS BIGINT) AS n_weeks,
             round(regr_slope(ln(rate), offset_wk), 6) AS decay_slope
      FROM rates WHERE rate > 0 GROUP BY cohort
      HAVING count(*) >= 3
    )
    SELECT cohort, n_weeks, decay_slope,
           CASE WHEN decay_slope < 0
                THEN round(ln(2) / (-decay_slope), 4) END AS half_life_periods
    FROM fit
    """,
)
def retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R174 retention-decay fitting: per signup cohort (first-activity
    DAY — the fixture's events span ~30 days, so daily cohorts give a
    real fit surface; on production data the bucket would be a week),
    regress ln(retention rate) on day offset — the exponential-decay
    model product teams use to project long-horizon retention from a
    few observed periods — and report the decay slope and implied
    half-life (periods). Rates are rounded to 9dp on both engines
    before ln (transcendental-input discipline); the fit is the
    decomposable regr_slope aggregate, so the whole query is joins +
    hash aggregates, no windows. Cohorts with <3 observed periods are
    dropped (an unstable 2-point fit is noise, not signal)."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit(RET_ANCHOR).cast("date"))
        .cast("bigint")
        .alias("wk"),
    ).distinct()
    first_wk = act.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    sizes = first_wk.groupBy("cohort").agg(
        F.count("*").cast("bigint").alias("n_users")
    )
    ret = (
        act.join(first_wk, on="user_id")
        .where(F.col("wk") > F.col("cohort"))
        .groupBy("cohort", (F.col("wk") - F.col("cohort")).alias("offset_wk"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )
    rates = ret.join(F.broadcast(sizes), on="cohort").select(
        "cohort",
        "offset_wk",
        F.round(F.col("n_active").cast("double") / F.col("n_users"), 9).alias(
            "rate"
        ),
    )
    fit = (
        rates.where(F.col("rate") > 0)
        .groupBy("cohort")
        .agg(
            F.count("*").cast("bigint").alias("n_weeks"),
            F.round(
                F.regr_slope(F.log("rate"), F.col("offset_wk").cast("double")),
                6,
            ).alias("decay_slope"),
        )
        .where(F.col("n_weeks") >= 3)
    )
    return fit.select(
        "cohort",
        "n_weeks",
        "decay_slope",
        F.when(
            F.col("decay_slope") < 0,
            F.round(F.lit(float(__import__("math").log(2))) / (-F.col("decay_slope")), 4),
        ).alias("half_life_periods"),
    )


ANOM_Z = 2.5  # |z| threshold on the decomposition residual


@register(
    "seasonal_anomaly_days",
    sql=f"""
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
    ctr AS (SELECT round(avg(s_raw), 2) AS s_mean FROM sr),
    dec AS (
      SELECT t.day, t.rev,
             round(t.rev - t.trend - (s.s_raw - c.s_mean), 2) AS resid
      FROM tr t JOIN sr s ON t.wd = s.wd CROSS JOIN ctr c
    ),
    sd AS (SELECT round(stddev_pop(resid), 2) AS s FROM dec)
    SELECT d.day, d.rev, d.resid,
           round(d.resid / n.s, 3) AS z
    FROM dec d CROSS JOIN sd n
    WHERE abs(round(d.resid / n.s, 3)) > {ANOM_Z}
    """,
)
def seasonal_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R175 seasonality-adjusted anomaly detection: z-score the
    RESIDUAL of the R165 classical decomposition (so weekday cycles
    and slow trend shifts never fire the alarm — the fix for naive
    z-scoring's Monday false positives) and report days with
    |z| > {ANOM_Z}. Composes the R165 plan (calendar-bounded window +
    7-row broadcast) with a 1-row stddev broadcast; the filter
    compares the ROUNDED z on both engines so the cut can't flip on
    ulp noise."""
    from zoom_spark.queries.round6_depth import seasonal_decompose_revenue

    dec = seasonal_decompose_revenue(spark, sf_dir).select(
        "day", "rev", "resid"
    )
    sd = dec.agg(F.round(F.stddev_pop("resid"), 2).alias("s"))
    z = F.round(F.col("resid") / F.col("s"), 3)
    return (
        dec.crossJoin(F.broadcast(sd))
        .select("day", "rev", "resid", z.alias("z"))
        .where(F.abs(F.col("z")) > ANOM_Z)
    )


GKF_K = 4  # folds


@register(
    "group_kfold_assignment",
    sql=f"""
    WITH tagged AS (
      SELECT doc_id, source,
             CAST(CAST('0x' || substring(md5(source), 1, 7) AS BIGINT)
                  % {GKF_K} AS BIGINT) AS fold
      FROM documents
    )
    SELECT fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM tagged GROUP BY fold
    """,
)
def group_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R176 group-aware k-fold (GroupKFold): folds are assigned by
    hashing the GROUP (source), not the row, so every document of a
    source lands in the same fold — the split discipline that stops
    correlated documents (same crawl domain, same author) from leaking
    across train/validation. Complements R105's stratified k-fold
    (which balances sources across folds — the opposite contract,
    right for i.i.d. rows; this one is right for correlated groups).
    Map-side assignment + one aggregate; zero cross-fold sources by
    construction (proven by the referee test)."""
    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5("source"), 1, 7), 16, 10).cast("bigint")
            % GKF_K
        ).alias("fold"),
    )
    return tagged.groupBy("fold").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
    )


@register(
    "importance_weight_ess",
    sql="""
    WITH target AS (
      SELECT t, CAST(count(*) AS BIGINT) AS c
      FROM (
        SELECT unnest(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS t
        FROM documents WHERE source = 'src0'
      ) GROUP BY 1
    ),
    tgt_tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM target),
    src AS (
      SELECT t, CAST(count(*) AS BIGINT) AS c
      FROM (
        SELECT unnest(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS t
        FROM documents
      ) GROUP BY 1
    ),
    src_tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM src),
    vocab AS (SELECT CAST(count(*) AS BIGINT) AS v FROM src),
    doc_w AS (
      SELECT d.doc_id, d.source,
             round(exp(sum(round(
               ln(((coalesce(tg.c, 0) + 1)
                   / CAST(tt.n + vb.v AS DOUBLE))
                  / ((s.c + 1) / CAST(st.n + vb.v AS DOUBLE))), 9)) 
               / count(*)), 9) AS w
      FROM (
        SELECT doc_id, source,
               unnest(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS t
        FROM documents
      ) d
      JOIN src s ON s.t = d.t
      LEFT JOIN target tg ON tg.t = d.t
      CROSS JOIN tgt_tot tt CROSS JOIN src_tot st CROSS JOIN vocab vb
      GROUP BY d.doc_id, d.source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(w) * sum(w) / sum(w * w) / count(*), 6) AS ess_frac,
           round(avg(w), 6) AS mean_w
    FROM doc_w GROUP BY source
    """,
)
def importance_weight_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R177 effective sample size of importance weights: per source,
    ESS/n = (Σw)²/(n·Σw²) for DSIR-style per-doc importance weights
    (geometric-mean per-token target/source likelihood ratio toward the
    'src0' target — the fixture's source ids are src0..src19) — the diagnostic that tells you how much a
    reweighting collapsed your effective data (ESS/n → 1 uniform,
    → 1/n one-doc-dominates; Kish 1965). The weight model reuses the
    R64 DSIR construction; ln inputs rounded to 9dp on both engines,
    per-doc weight is exp of the MEAN log-ratio (geometric mean) so
    doc length doesn't explode the scale. One token join against the
    broadcast LM frames + two aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("t"),
    )
    target = (
        tok.where(F.col("source") == "src0")
        .groupBy("t")
        .agg(F.count("*").cast("bigint").alias("tc"))
    )
    src = tok.groupBy("t").agg(F.count("*").cast("bigint").alias("sc"))
    tgt_tot = target.agg(F.sum("tc").cast("bigint").alias("tn"))
    src_tot = src.agg(F.sum("sc").cast("bigint").alias("sn"))
    vocab = src.agg(F.count("*").cast("bigint").alias("v"))
    ratio = F.round(
        F.log(
            (
                (F.coalesce(F.col("tc"), F.lit(0)) + 1)
                / (F.col("tn") + F.col("v")).cast("double")
            )
            / ((F.col("sc") + 1) / (F.col("sn") + F.col("v")).cast("double"))
        ),
        9,
    )
    doc_w = (
        tok.join(src, on="t")
        .join(F.broadcast(target), on="t", how="left")
        .crossJoin(F.broadcast(tgt_tot))
        .crossJoin(F.broadcast(src_tot))
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "source")
        .agg(F.round(F.exp(F.sum(ratio) / F.count("*")), 9).alias("w"))
    )
    return doc_w.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(
            F.sum("w") * F.sum("w") / F.sum(F.col("w") * F.col("w"))
            / F.count("*"),
            6,
        ).alias("ess_frac"),
        F.round(F.avg("w"), 6).alias("mean_w"),
    )


@register(
    "wasserstein_weekend_value",
    sql="""
    WITH s AS (
      SELECT value AS v,
             CASE WHEN CAST((CAST(ts AS DATE) - DATE '2024-01-01') % 7
                       AS BIGINT) IN (5, 6) THEN 1 ELSE 0 END AS grp
      FROM events
    ),
    pv AS (
      SELECT v,
             CAST(sum(grp) AS BIGINT) AS na,
             CAST(count(*) - sum(grp) AS BIGINT) AS nb
      FROM s GROUP BY v
    ),
    c AS (
      SELECT v,
             sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS ca,
             sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cb,
             lead(v) OVER (ORDER BY v) AS v_next
      FROM pv
    ),
    tot AS (SELECT CAST(sum(na) AS BIGINT) AS n_a,
                   CAST(sum(nb) AS BIGINT) AS n_b FROM pv)
    SELECT t.n_a, t.n_b,
           round(sum(abs(c.ca * 1.0 / t.n_a - c.cb * 1.0 / t.n_b)
                     * (c.v_next - c.v)), 6) AS w1
    FROM c CROSS JOIN tot t
    WHERE c.v_next IS NOT NULL
    GROUP BY t.n_a, t.n_b
    """,
)
def wasserstein_weekend_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R178 two-sample Wasserstein-1 (earth mover) distance, weekend
    vs weekday event values: W1 = integral |ECDF_a - ECDF_b| — the
    magnitude-aware complement to the KS sup statistic (KS sees THAT
    distributions differ; W1 sees by HOW MUCH, in value units — the
    metric used for drift budgets). Same scale shape as the R96 KS:
    one hash aggregate to per-distinct-value counts, running counts
    via the two-phase distributed prefix-sum, and the next-value gap
    via a rank equi-join (global_row_number rn ⋈ rn+1) instead of an
    unpartitioned lead() window — no single-task stage anywhere."""
    from zoom_spark.operators.prefix import global_row_number, prefix_sum

    ev = load_table(spark, sf_dir, "events")
    wd = (
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        % 7
    ).cast("bigint")
    s = ev.select(
        F.col("value").alias("v"),
        F.when(wd.isin(5, 6), 1).otherwise(0).alias("grp"),
    )
    pv = s.groupBy("v").agg(
        F.sum("grp").cast("bigint").alias("na"),
        (F.count("*") - F.sum("grp")).cast("bigint").alias("nb"),
    )
    c = prefix_sum(pv, "v", ["na", "nb"], out_col=["ca", "cb"])  # merged: one two-phase scan for all running sums (r13)
    ranked = global_row_number(c, ["v"], out_col="rn")
    nxt = ranked.select(
        (F.col("rn") - 1).alias("rn"), F.col("v").alias("v_next")
    )
    gaps = ranked.join(nxt, on="rn")
    tot = pv.agg(
        F.sum("na").cast("bigint").alias("n_a"),
        F.sum("nb").cast("bigint").alias("n_b"),
    )
    return (
        gaps.crossJoin(F.broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(
            F.round(
                F.sum(
                    F.abs(
                        F.col("ca") * 1.0 / F.col("n_a")
                        - F.col("cb") * 1.0 / F.col("n_b")
                    )
                    * (F.col("v_next") - F.col("v"))
                ),
                6,
            ).alias("w1")
        )
    )


DID_CUT = "1996-01-01"


@register(
    "diff_in_diff_order_value",
    sql=f"""
    WITH tagged AS (
      SELECT CASE WHEN substring(md5(CAST(o_custkey AS VARCHAR)), 1, 1)
                  < '8' THEN 'treatment' ELSE 'control' END AS arm,
             CASE WHEN o_orderdate >= DATE '{DID_CUT}'
                  THEN 'post' ELSE 'pre' END AS period,
             o_totalprice AS y
      FROM orders
    ),
    cells AS (
      SELECT arm, period,
             CAST(count(*) AS BIGINT) AS n,
             round(avg(y), 4) AS mean_y
      FROM tagged GROUP BY 1, 2
    )
    SELECT t_post.mean_y AS treat_post, t_pre.mean_y AS treat_pre,
           c_post.mean_y AS ctrl_post, c_pre.mean_y AS ctrl_pre,
           round((t_post.mean_y - t_pre.mean_y)
                 - (c_post.mean_y - c_pre.mean_y), 4) AS did_estimate,
           t_post.n + t_pre.n + c_post.n + c_pre.n AS n_total
    FROM (SELECT * FROM cells WHERE arm='treatment' AND period='post') t_post,
         (SELECT * FROM cells WHERE arm='treatment' AND period='pre') t_pre,
         (SELECT * FROM cells WHERE arm='control' AND period='post') c_post,
         (SELECT * FROM cells WHERE arm='control' AND period='pre') c_pre
    """,
)
def diff_in_diff_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R179 difference-in-differences: the 2x2 (arm x pre/post) cell
    means and the DiD effect (ΔT - ΔC) — the quasi-experimental
    estimator that nets out both group baselines and common time
    shocks when randomization isn't available (the md5 arm split makes
    the true effect ~0 here, a placebo check). One hash aggregate to
    four cells, then scalar pivots over the 4-row frame; cell means
    4dp-rounded on both engines before the difference arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    tagged = o.select(
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1) < "8",
            "treatment",
        )
        .otherwise("control")
        .alias("arm"),
        F.when(
            F.col("o_orderdate") >= F.lit(DID_CUT).cast("date"), "post"
        )
        .otherwise("pre")
        .alias("period"),
        F.col("o_totalprice").alias("y"),
    )
    cells = tagged.groupBy("arm", "period").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("y"), 4).alias("mean_y"),
    )
    wide = cells.groupBy().pivot(
        "arm", ["treatment", "control"]
    ).agg(
        F.sum(F.when(F.col("period") == "post", F.col("mean_y"))).alias("post"),
        F.sum(F.when(F.col("period") == "pre", F.col("mean_y"))).alias("pre"),
        F.sum("n").alias("n"),
    )
    return wide.select(
        F.col("treatment_post").alias("treat_post"),
        F.col("treatment_pre").alias("treat_pre"),
        F.col("control_post").alias("ctrl_post"),
        F.col("control_pre").alias("ctrl_pre"),
        F.round(
            (F.col("treatment_post") - F.col("treatment_pre"))
            - (F.col("control_post") - F.col("control_pre")),
            4,
        ).alias("did_estimate"),
        (F.col("treatment_n") + F.col("control_n"))
        .cast("bigint")
        .alias("n_total"),
    )


W2V_T = 1e-3  # word2vec subsampling threshold
W2V_MIN_COUNT = 5


@register(
    "word2vec_sampling_table",
    sql=f"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '),
                                x -> x <> '')) AS t
      FROM documents
    ),
    cnt AS (
      SELECT t, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 1 HAVING count(*) >= {W2V_MIN_COUNT}
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
    z AS (SELECT round(sum(pow(c, 0.75)), 6) AS z FROM cnt)
    SELECT c.t, c.c,
           round(least(1.0,
             sqrt({W2V_T} / (c.c * 1.0 / tt.n))
             + {W2V_T} / (c.c * 1.0 / tt.n)), 6) AS keep_prob,
           round(pow(c.c, 0.75) / zz.z, 9) AS neg_prob
    FROM cnt c CROSS JOIN tot tt CROSS JOIN z zz
    """,
)
def word2vec_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R180 word2vec sampling tables (Mikolov et al. 2013): per vocab
    token the frequent-word subsampling keep-probability
    sqrt(t/f)+t/f and the count^0.75 negative-sampling distribution —
    the two frequency transforms every skip-gram/NCE pipeline
    precomputes before training. One token aggregate + two 1-row
    normalizer broadcasts; min-count prunes the tail before the
    broadcast-sized table is emitted."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("t")
    )
    cnt = (
        tok.groupBy("t")
        .agg(F.count("*").cast("bigint").alias("c"))
        .where(F.col("c") >= W2V_MIN_COUNT)
    )
    tot = cnt.agg(F.sum("c").cast("bigint").alias("n"))
    z = cnt.agg(F.round(F.sum(F.pow("c", 0.75)), 6).alias("z"))
    f = F.col("c") * 1.0 / F.col("n")
    return (
        cnt.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(z))
        .select(
            "t",
            "c",
            F.round(
                F.least(F.lit(1.0), F.sqrt(W2V_T / f) + W2V_T / f), 6
            ).alias("keep_prob"),
            F.round(F.pow("c", 0.75) / F.col("z"), 9).alias("neg_prob"),
        )
    )


SEQ_BUCKETS = [32, 64, 128, 256]  # context-length bucket caps (words)


@register(
    "padding_waste_report",
    sql=f"""
    WITH lens AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS BIGINT) AS n_tok
      FROM documents
    ),
    capped AS (
      SELECT doc_id, least(n_tok, {SEQ_BUCKETS[-1]}) AS n_tok,
             CASE
               WHEN n_tok <= 32 THEN 32
               WHEN n_tok <= 64 THEN 64
               WHEN n_tok <= 128 THEN 128
               ELSE 256 END AS bucket_cap
      FROM lens
    )
    SELECT bucket_cap,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS real_tokens,
           CAST(sum(bucket_cap - n_tok) AS BIGINT) AS pad_tokens,
           round(sum(n_tok) * 1.0 / sum(bucket_cap), 6) AS bucket_efficiency,
           round(sum(n_tok) * 1.0 / (count(*) * {SEQ_BUCKETS[-1]}), 6)
             AS unbucketed_efficiency
    FROM capped GROUP BY bucket_cap
    """,
)
def padding_waste_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R181 sequence length-bucketing padding report: assign each doc
    to the smallest context bucket {SEQ_BUCKETS} that fits (truncating
    at the max), and report per-bucket real vs padding tokens and the
    batch efficiency with and without bucketing — the accounting that
    justifies bucketed batching in a training pipeline (padding is
    pure wasted FLOPs). Map-side length + bucket tag, one aggregate;
    the efficiency columns make the bucketing win directly visible."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split(F.lower("text"), " "), lambda x: x != ""))
    lens = docs.select(F.col("doc_id"), n_tok.cast("bigint").alias("n_tok"))
    cap = F.when(F.col("n_tok") <= 32, 32).when(
        F.col("n_tok") <= 64, 64
    ).when(F.col("n_tok") <= 128, 128).otherwise(256)
    capped = lens.select(
        F.least(F.col("n_tok"), F.lit(SEQ_BUCKETS[-1])).alias("n_tok"),
        cap.alias("bucket_cap"),
    )
    return capped.groupBy("bucket_cap").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("real_tokens"),
        F.sum(F.col("bucket_cap") - F.col("n_tok"))
        .cast("bigint")
        .alias("pad_tokens"),
        F.round(
            F.sum("n_tok") * 1.0 / F.sum("bucket_cap"), 6
        ).alias("bucket_efficiency"),
        F.round(
            F.sum("n_tok") * 1.0 / (F.count("*") * SEQ_BUCKETS[-1]), 6
        ).alias("unbucketed_efficiency"),
    )


CONF_ALPHA = 0.1  # target 90% coverage


@register(
    "conformal_interval_coverage",
    sql=f"""
    WITH cust AS (
      SELECT o_custkey,
             round(sum(o_totalprice), 2) AS y,
             CAST(count(*) AS BIGINT) AS n_orders,
             CASE WHEN o_custkey % 2 = 0 THEN 'cal' ELSE 'test' END AS split
      FROM orders GROUP BY o_custkey
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_orders) AS BIGINT) AS sx,
             round(sum(y), 2) AS sy,
             CAST(sum(n_orders * n_orders) AS BIGINT) AS sxx,
             round(sum(n_orders * y), 2) AS sxy
      FROM cust WHERE split = 'cal'
    ),
    model AS (
      SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a
      FROM mom
    ),
    resid AS (
      SELECT c.split, abs(c.y - (m.a + m.b * c.n_orders)) AS r
      FROM cust c CROSS JOIN model m
    ),
    nc AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM resid WHERE split = 'cal'
    ),
    kk AS (
      SELECT least(n, CAST(ceil((1 - {CONF_ALPHA}) * (n + 1)) AS BIGINT))
               AS k
      FROM nc
    ),
    cum AS (
      SELECT r, sum(cnt) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS c
      FROM (SELECT r, count(*) AS cnt FROM resid
            WHERE split = 'cal' GROUP BY r)
    ),
    qhat AS (
      SELECT round(min(cum.r), 6) AS q FROM cum CROSS JOIN kk
      WHERE cum.c >= kk.k
    )
    SELECT CAST(count(*) AS BIGINT) AS n_test,
           round(q.q, 6) AS interval_halfwidth,
           round(avg(CASE WHEN t.r <= q.q THEN 1.0 ELSE 0.0 END), 6)
             AS coverage
    FROM (SELECT r FROM resid WHERE split = 'test') t CROSS JOIN qhat q
    GROUP BY q.q
    """,
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R182 split-conformal prediction intervals (Vovk; Lei et al.):
    fit a 1-feature regression (total spend ~ order count; sums, not
    means — a sum of 2dp prices sits exactly ON the cent grid, so the
    2dp rounding is noise-free on both engines) on the calibration half, take the
    ceil((1-alpha)(n+1))-th smallest absolute calibration residual
    (the classical order statistic — computed by the distributed
    prefix-count selection, no single-task sort) as the interval
    half-width, and report the achieved
    coverage on the held-out half — the distribution-free uncertainty
    wrapper every production model should ship with (coverage >= 90%
    guaranteed in expectation regardless of the model being wrong).
    Decomposable regr_* fit + one exact-percentile reduce + one
    coverage aggregate; model and q-hat are 1-row broadcasts."""
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("y"),
        F.count("*").cast("bigint").alias("n_orders"),
    ).withColumn(
        "split",
        F.when(F.col("o_custkey") % 2 == 0, "cal").otherwise("test"),
    )
    # moments rounded on both engines BEFORE the closed-form solve
    # (the ols_normal_equations discipline): the coefficient then
    # comes from identical double arithmetic on identical inputs, so
    # summation-order noise cannot flip a rounded coefficient digit
    mom = cust.where(F.col("split") == "cal").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("n_orders").cast("bigint").alias("sx"),
        F.round(F.sum("y"), 2).alias("sy"),
        F.sum(F.col("n_orders") * F.col("n_orders")).cast("bigint").alias("sxx"),
        F.round(F.sum(F.col("n_orders") * F.col("y")), 2).alias("sxy"),
    )
    b_expr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    model = mom.select(
        b_expr.alias("b"),
        ((F.col("sy") - b_expr * F.col("sx")) / F.col("n")).alias("a"),
    )
    resid = cust.crossJoin(F.broadcast(model)).select(
        "split",
        F.abs(
            F.col("y") - (F.col("a") + F.col("b") * F.col("n_orders"))
        ).alias("r"),
    )
    from zoom_spark.operators.prefix import prefix_sum

    cal = resid.where(F.col("split") == "cal")
    nc = cal.agg(F.count("*").cast("bigint").alias("n"))
    kk = nc.select(
        F.least(
            F.col("n"),
            F.ceil((1 - CONF_ALPHA) * (F.col("n") + 1)).cast("bigint"),
        ).alias("k")
    )
    pv = cal.groupBy("r").agg(F.count("*").alias("cnt"))
    cum = prefix_sum(pv, "r", "cnt", out_col="c")
    qhat = (
        cum.crossJoin(F.broadcast(kk))
        .where(F.col("c") >= F.col("k"))
        .agg(F.round(F.min("r"), 6).alias("q"))
    )
    test = resid.where(F.col("split") == "test")
    return (
        test.crossJoin(F.broadcast(qhat))
        .groupBy("q")
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.round(
                F.avg(F.when(F.col("r") <= F.col("q"), 1.0).otherwise(0.0)), 6
            ).alias("coverage"),
        )
        .select(
            "n_test",
            F.round(F.col("q"), 6).alias("interval_halfwidth"),
            "coverage",
        )
    )


BH_ALPHA = 0.05


@register(
    "bh_fdr_correction",
    sql=f"""
    WITH seg AS (
      SELECT c.c_mktsegment || '/' || CAST(c.c_nationkey AS VARCHAR)
               AS cell,
             CASE WHEN substring(md5(CAST(o.o_custkey AS VARCHAR)), 1, 1)
                  < '8' THEN 1 ELSE 0 END AS grp,
             o.o_totalprice AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    stats AS (
      SELECT cell,
             CAST(sum(grp) AS BIGINT) AS n1,
             CAST(count(*) - sum(grp) AS BIGINT) AS n0,
             round(avg(CASE WHEN grp = 1 THEN y END), 6) AS m1,
             round(avg(CASE WHEN grp = 0 THEN y END), 6) AS m0,
             round(var_samp(CASE WHEN grp = 1 THEN y END), 2) AS v1,
             round(var_samp(CASE WHEN grp = 0 THEN y END), 2) AS v0
      FROM seg GROUP BY cell
      HAVING sum(grp) >= 5 AND count(*) - sum(grp) >= 5
    ),
    tests AS (
      SELECT cell,
             round(abs(m1 - m0) / sqrt(v1 / n1 + v0 / n0), 6) AS z
      FROM stats WHERE v1 > 0 AND v0 > 0
    ),
    pvals AS (
      -- two-sided p from |z| via the Abramowitz-Stegun 7.1.26
      -- erf polynomial, written IDENTICALLY on both engines so the
      -- approximation (not each engine's own erf) is the contract
      SELECT cell, z,
             round(2 * 0.5 * ((0.254829592 * t - 0.284496736 * t * t
                    + 1.421413741 * t * t * t
                    - 1.453152027 * t * t * t * t
                    + 1.061405429 * t * t * t * t * t)
                   * exp(-(z * z) / 2)), 9) AS p
      FROM (
        SELECT cell, z,
               1 / (1 + 0.3275911 * (z / sqrt(2.0))) AS t
        FROM tests
      )
    ),
    ranked AS (
      SELECT cell, z, p,
             row_number() OVER (ORDER BY p, cell) AS rk,
             count(*) OVER () AS m
      FROM pvals
    ),
    thresh AS (
      SELECT max(rk) AS k FROM ranked
      WHERE p <= {BH_ALPHA} * rk * 1.0 / m
    )
    SELECT r.cell, r.z, r.p, CAST(r.rk AS BIGINT) AS rk,
           (t.k IS NOT NULL AND r.rk <= t.k) AS rejected
    FROM ranked r CROSS JOIN thresh t
    """,
)
def bh_fdr_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R183 Benjamini-Hochberg FDR correction over a battery of
    per-cell z-tests (placebo md5 arms across segment x nation cells):
    rank p-values, find the largest k with p_(k) <= alpha*k/m, reject
    the first k — the multiple-testing discipline that stops a
    125-cell dashboard from reporting ~6 false 'significant' cells at
    alpha=0.05. The per-cell Welch z-stats come from one decomposable
    aggregate; the p-value rank uses the two-phase global_row_number
    (the battery is cell-count-sized anyway); the BH threshold is a
    1-row broadcast. The normal tail comes from the Abramowitz-
    Stegun erf polynomial written identically on both engines (the
    portable-transcendental discipline; Spark has no builtin erf)."""
    from zoom_spark.operators.prefix import global_row_number

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    seg = o.join(c, c["c_custkey"] == o["o_custkey"]).select(
        F.concat_ws(
            "/", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("cell"),
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1) < "8",
            1,
        )
        .otherwise(0)
        .alias("grp"),
        F.col("o_totalprice").alias("y"),
    )
    stats = (
        seg.groupBy("cell")
        .agg(
            F.sum("grp").cast("bigint").alias("n1"),
            (F.count("*") - F.sum("grp")).cast("bigint").alias("n0"),
            F.round(F.avg(F.when(F.col("grp") == 1, F.col("y"))), 6).alias("m1"),
            F.round(F.avg(F.when(F.col("grp") == 0, F.col("y"))), 6).alias("m0"),
            F.round(
                F.var_samp(F.when(F.col("grp") == 1, F.col("y"))), 2
            ).alias("v1"),
            F.round(
                F.var_samp(F.when(F.col("grp") == 0, F.col("y"))), 2
            ).alias("v0"),
        )
        .where((F.col("n1") >= 5) & (F.col("n0") >= 5))
    )
    tests = stats.where((F.col("v1") > 0) & (F.col("v0") > 0)).select(
        "cell",
        F.round(
            F.abs(F.col("m1") - F.col("m0"))
            / F.sqrt(F.col("v1") / F.col("n1") + F.col("v0") / F.col("n0")),
            6,
        ).alias("z"),
    )
    t = 1 / (1 + 0.3275911 * (F.col("z") / F.sqrt(F.lit(2.0))))
    poly = (
        0.254829592 * t
        - 0.284496736 * t * t
        + 1.421413741 * t * t * t
        - 1.453152027 * t * t * t * t
        + 1.061405429 * t * t * t * t * t
    )
    pvals = tests.select(
        "cell",
        "z",
        F.round(
            2 * 0.5 * (poly * F.exp(-(F.col("z") * F.col("z")) / 2)), 9
        ).alias("p"),
    )
    ranked = global_row_number(pvals, ["p", "cell"], out_col="rk")
    m_tot = pvals.count()
    thresh = (
        ranked.where(F.col("p") <= BH_ALPHA * F.col("rk") / F.lit(m_tot))
        .agg(F.max("rk").alias("k"))
    )
    return (
        ranked.crossJoin(F.broadcast(thresh))
        .select(
            "cell",
            "z",
            "p",
            F.col("rk").cast("bigint").alias("rk"),
            (F.col("k").isNotNull() & (F.col("rk") <= F.col("k"))).alias(
                "rejected"
            ),
        )
    )


RAKE_STOPWORDS = (
    "the,a,an,and,or,of,to,in,is,are,was,were,for,on,with,as,by,at,"
    "it,this,that,be,from,has,have,had,not,but,they,their,we,you,i"
)
RAKE_TOPK = 50


@register(
    "rake_keywords",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, t.i AS p, ws[t.i] AS w
      FROM (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
        FROM documents
      )
      CROSS JOIN LATERAL (
        SELECT unnest(generate_series(1, len(ws))) AS i
      ) t
    ),
    flagged AS (
      SELECT doc_id, p, w,
             CASE WHEN list_contains(string_split('{RAKE_STOPWORDS}', ','), w)
                  THEN 1 ELSE 0 END AS stop
      FROM tok
    ),
    runs AS (
      SELECT doc_id, p, w,
             p - row_number() OVER (PARTITION BY doc_id ORDER BY p)
               AS island
      FROM flagged WHERE stop = 0
    ),
    phrases AS (
      SELECT doc_id, island,
             string_agg(w, ' ' ORDER BY p) AS phrase,
             CAST(count(*) AS BIGINT) AS plen
      FROM runs GROUP BY doc_id, island
      HAVING count(*) BETWEEN 2 AND 4
    ),
    members AS (
      SELECT r.doc_id, r.island, r.w, ph.plen
      FROM runs r JOIN phrases ph
        ON ph.doc_id = r.doc_id AND ph.island = r.island
    ),
    wordstats AS (
      SELECT w,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(plen) AS BIGINT) AS degree
      FROM members GROUP BY w
    ),
    scored AS (
      SELECT p.phrase,
             CAST(count(*) AS BIGINT) AS n_occurrences,
             round(sum(sc.s), 6) AS rake_score
      FROM phrases p
      JOIN (
        SELECT m.doc_id, m.island,
               sum(CAST(ws.degree AS DOUBLE) / ws.freq) AS s
        FROM members m JOIN wordstats ws ON ws.w = m.w
        GROUP BY m.doc_id, m.island
      ) sc ON sc.doc_id = p.doc_id AND sc.island = p.island
      GROUP BY p.phrase
    )
    SELECT phrase, n_occurrences, rake_score FROM scored
    ORDER BY rake_score DESC, phrase LIMIT {RAKE_TOPK}
    """,
)
def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R185 RAKE keyword extraction (Rose et al. 2010): candidate
    phrases are maximal stopword-free token runs (gaps-and-islands on
    token positions, per-doc window — healthy partitioning), each
    word scored degree/frequency over phrase co-occurrence, each
    phrase scored as the sum of member word scores; corpus-level
    top-{RAKE_TOPK} phrases (2-4 words). Everything is exact integer
    degree/freq arithmetic plus one 6dp-rounded division, so the
    DuckDB twin hashes exactly; at 100 TB the phrase and word frames
    are vocabulary-sized, and the only data-sized shuffles are the
    token explode and the phrase aggregate."""
    from zoom_spark.io import spread_scan

    docs = load_table(spark, sf_dir, "documents")
    stop = RAKE_STOPWORDS.split(",")
    # tokenize+explode below the first exchange: spread the pruned
    # single-split scan (no-op on a parallel scan)
    tok = spread_scan(docs.select("doc_id", "text")).select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("p0", "w"),
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "w")
    nonstop = tok.where(~F.col("w").isin(stop))
    wd = Window.partitionBy("doc_id").orderBy("p")
    runs = nonstop.withColumn(
        "island", F.col("p") - F.row_number().over(wd)
    )
    phrases = (
        runs.groupBy("doc_id", "island")
        .agg(
            F.concat_ws(" ", F.array_sort(
                F.collect_list(F.struct("p", "w"))
            ).getField("w")).alias("phrase"),
            F.count("*").cast("bigint").alias("plen"),
        )
        .where(F.col("plen").between(2, 4))
    )
    members = runs.join(
        phrases.select("doc_id", "island", "plen"),
        on=["doc_id", "island"],
    ).select("doc_id", "island", "w", "plen")
    wordstats = members.groupBy("w").agg(
        F.count("*").cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("degree"),
    )
    per_phrase = (
        members.join(F.broadcast(wordstats), on="w")
        .groupBy("doc_id", "island")
        .agg(
            F.sum(F.col("degree").cast("double") / F.col("freq")).alias("s")
        )
    )
    scored = (
        phrases.join(per_phrase, on=["doc_id", "island"])
        .groupBy("phrase")
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.round(F.sum("s"), 6).alias("rake_score"),
        )
    )
    return scored.orderBy(F.col("rake_score").desc(), "phrase").limit(
        RAKE_TOPK
    )

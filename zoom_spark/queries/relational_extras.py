"""Relational-breadth gated queries, round 4: LATERAL correlated
subquery, null-safe equality join, and positional bigram counting.

These close the last ANSI-join-shape gaps in the §2.3/§2.8 families:
LATERAL is the standard "top-N detail rows per outer row" idiom
(decorrelated by Catalyst into WindowGroupLimit + equi-join — the
plan a hand-written window query would produce, proving the
decorrelation); null-safe equality (`<=>` / IS NOT DISTINCT FROM) is
the join form GROUP BY-with-null-keys pipelines need; bigrams are
the positional higher-order-array idiom (zip of shifted slices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.functions.text import ws_tokens
from zoom_spark.io import load_table, register_views
from zoom_spark.queries import register

LATERAL_SQL = """
SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
"""


@register("lateral_top_orders_per_customer", sql=LATERAL_SQL)
def lateral_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL top-2 orders per customer — the identical
    SQL text runs on both engines (recursive_tree_depth precedent).
    Catalyst decorrelates it to WindowGroupLimit (map-side top-k
    pre-prune) + BroadcastHashJoin: the scale-correct plan, with no
    per-outer-row re-execution anywhere."""
    register_views(spark, sf_dir)
    return spark.sql(LATERAL_SQL)


@register(
    "null_safe_join_segments",
    sql="""
    WITH tagged AS (
      SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
      FROM customer
    ),
    sizes AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS n_in_seg
      FROM tagged GROUP BY seg
    )
    SELECT t.c_custkey, t.seg, s.n_in_seg
    FROM tagged t JOIN sizes s ON t.seg IS NOT DISTINCT FROM s.seg
    """,
)
def null_safe_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`eqNullSafe` / IS NOT DISTINCT FROM):
    the NULL segment group joins to its own size row instead of
    dropping out as an ordinary equi-join would. Still hash-joinable
    (null-safe equality is a deterministic key function), so the
    small aggregated side broadcasts — no nested-loop fallback."""
    c = load_table(spark, sf_dir, "customer")
    tagged = c.select(
        "c_custkey", F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg")
    )
    sizes = tagged.groupBy("seg").agg(F.count("*").alias("n_in_seg"))
    return (
        tagged.alias("t")
        .join(
            F.broadcast(sizes.alias("s")),
            F.col("t.seg").eqNullSafe(F.col("s.seg")),
        )
        .select("t.c_custkey", "t.seg", "s.n_in_seg")
    )


@register(
    "bigram_counts",
    sql=r"""
    WITH tok AS (
      SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    pairs AS (
      SELECT ts[i] AS w1, ts[i + 1] AS w2
      FROM tok, LATERAL (
        SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g
    )
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
    FROM pairs GROUP BY w1, w2
    HAVING count(*) >= 20
    """,
)
def bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts (language-model / collocation primitive):
    adjacent-token pairs via a zip of shifted array slices — pure
    higher-order expressions, the explode happens AFTER pairing so
    each token shuffles once, not twice. Zipf-skewed key space, but
    the aggregate is map-side partial so hot bigrams combine before
    the exchange."""
    docs = load_table(spark, sf_dir, "documents")
    ts = ws_tokens(F.lower("text"))
    pairs = docs.select(
        F.explode(
            F.zip_with(
                F.slice(ts, 1, F.greatest(F.size(ts) - 1, F.lit(0))),
                F.slice(ts, 2, F.greatest(F.size(ts) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    )
    return (
        pairs.select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 20)
    )


@register(
    "bigram_logprob_quality",
    sql=r"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    pairs AS (
      SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
      FROM tok, LATERAL (
        SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g
    ),
    uni AS (
      SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM pairs GROUP BY w1
    ),
    bi AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
      FROM pairs GROUP BY w1, w2
    ),
    v AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM uni)
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((bi.c2 + 1.0) / (uni.c1 + v.vocab))), 4) AS avg_logprob
    FROM pairs p
    JOIN bi  ON p.w1 = bi.w1 AND p.w2 = bi.w2
    JOIN uni ON p.w1 = uni.w1
    CROSS JOIN v
    GROUP BY p.doc_id
    """,
)
def bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM document quality with add-1 smoothing — the
    next-order refinement of the CCNet-style unigram filter
    (unigram_logprob_quality): docs whose ADJACENT-token transitions
    are improbable under the corpus bigram LM score low even when
    each token is individually common (word salad). Three aggregates
    over the same pair stream (bigram counts, left-unigram counts,
    vocab scalar), then one enrichment join back onto the pairs; the
    model side of each join is the SMALL side (distinct n-grams vs
    the token stream), Zipf-skewed on stopword bigrams — AQE
    broadcast/skew-handles it. Rounded to 4dp so cross-engine libm
    ln+avg noise cannot move the hash."""
    docs = load_table(spark, sf_dir, "documents")
    ts = ws_tokens(F.lower("text"))
    pairs = docs.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(ts, 1, F.greatest(F.size(ts) - 1, F.lit(0))),
                F.slice(ts, 2, F.greatest(F.size(ts) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    uni = pairs.groupBy("w1").agg(F.count("*").alias("c1"))
    bi = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    vocab = uni.agg(F.count("*").alias("vocab"))
    scored = (
        pairs.join(bi, on=["w1", "w2"])
        .join(uni, on="w1")
        .crossJoin(F.broadcast(vocab))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(
            F.avg(F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("vocab")))), 4
        ).alias("avg_logprob"),
    )


LEFT_LATERAL_SQL = """
SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
FROM customer c LEFT JOIN LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) l ON true
"""


@register("left_lateral_latest_urgent_order", sql=LEFT_LATERAL_SQL)
def left_lateral_latest_urgent_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT (outer-preserving) LATERAL: each customer keeps exactly
    one row even with zero urgent orders (NULL detail columns) — the
    semantic an inner LATERAL or a plain window query silently drops.
    Identical SQL text on both engines; Catalyst decorrelates to
    WindowGroupLimit + LEFT BroadcastHashJoin with the priority
    filter pushed to the orders scan."""
    register_views(spark, sf_dir)
    return spark.sql(LEFT_LATERAL_SQL)


@register(
    "merge_order_intervals",
    sql="""
    WITH iv AS (
      SELECT o_custkey, o_orderdate AS s,
             o_orderdate + INTERVAL 30 DAY AS e
      FROM orders
    ),
    m AS (
      SELECT o_custkey, s, e,
             max(e) OVER (PARTITION BY o_custkey ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM iv
    ),
    fl AS (
      SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max
                     THEN 1 ELSE 0 END AS new_island
      FROM m
    ),
    isl AS (
      SELECT *, sum(new_island) OVER (PARTITION BY o_custkey ORDER BY s, e
                                      ROWS UNBOUNDED PRECEDING) AS island
      FROM fl
    )
    SELECT o_custkey, CAST(island AS BIGINT) AS island,
           min(s) AS island_start, max(e) AS island_end,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM isl GROUP BY o_custkey, island
    """,
)
def merge_order_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval merging (the classic SQL pattern,
    applied to 30-day order-activity spans per customer): running
    max-of-end over a 1-row-lagged frame detects island starts, a
    running sum numbers them, one aggregate merges each island. All
    three passes share ONE window partitioning (o_custkey) — a single
    shuffle, then map-side window work; no self-joins, no recursion.
    The building block behind SCD coalescing, sessionized billing,
    and coverage/uptime reports."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    iv = o.select(
        "o_custkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("e"),
    )
    w = Window.partitionBy("o_custkey").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    fl = iv.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
    )
    isl = fl.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return isl.groupBy("o_custkey", F.col("island").cast("long").alias("island")).agg(
        F.min("s").alias("island_start"),
        F.max("e").alias("island_end"),
        F.count("*").alias("n_orders"),
    )


@register(
    "gini_customer_spend",
    sql="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
               AS x
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT x, CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS i
      FROM spend
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DECIMAL(38,2)) AS total,
             CAST(sum(i * x) AS DECIMAL(38,2)) AS weighted
      FROM ranked
    )
    SELECT n, round(CAST(total AS DOUBLE), 2) AS total,
           round(2.0 * weighted / (n * total) - (n + 1.0) / n, 6) AS gini
    FROM agg
    """,
)
def gini_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer spend (the inequality / skew
    diagnostic a data-balance audit reports): rank formula
    G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over ascending spend. The
    global rank uses operators/prefix.global_row_number — range
    partition + local row_number + O(P) offsets — NOT a single-task
    global window, so the ranking pass survives 100 TB. Sums are
    decimal (exact merge), only the final ratio is floating."""
    from zoom_spark.operators.prefix import global_row_number

    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("x")
    )
    ranked = global_row_number(spend, ["x", "o_custkey"], out_col="i")
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("decimal(38,2)").alias("total"),
        F.sum(F.col("i") * F.col("x")).cast("decimal(38,2)").alias("weighted"),
    )
    return agg.select(
        "n",
        F.round(F.col("total").cast("double"), 2).alias("total"),
        F.round(
            2.0 * F.col("weighted") / (F.col("n") * F.col("total"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
    )

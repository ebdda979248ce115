"""Round-5 pipeline-breadth operators (R62-R68).

Training-data curation and warehouse-analytics additions beyond the
round-4 registry: alignment-invariant substring-duplication (the
correct form of the stride-gram detector), a Count-Min sketch built
from relational ops, DSIR-style importance weighting (Xie et al.,
arXiv:2302.03169), marketing-touch attribution, bounded-depth BFS,
MAD-based robust anomaly flagging, and the BPE merge-candidate scan
that sits in the inner loop of tokenizer training.

All are DataFrame-first with exact DuckDB oracle twins; hash
pseudo-randomness uses the repo's md5-prefix idiom so both engines
agree bit-for-bit.

Reference parity note: the reference pipeline (see
/root/reference/main.py) has no analog for any of these — they are
part of the mandated LLM-pipeline extension family (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.io import load_table, spread_scan
from zoom_spark.queries import register

GRAM = 24
STRIDE = 8


@register(
    "duplicate_spans_invariant",
    sql=f"""
    WITH grams AS (
      SELECT doc_id,
             md5(substring(text, i, {GRAM})) AS gram_md5,
             CAST((i % {STRIDE}) = 1 AS INT) AS anchored
      FROM documents
      CROSS JOIN LATERAL (
        SELECT unnest(generate_series(1, length(text) - {GRAM - 1}, 1)) AS i
      )
      WHERE length(text) >= {GRAM}
    ),
    per_gram AS (
      SELECT gram_md5,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT CASE WHEN anchored = 1 THEN doc_id END)
                  AS BIGINT) AS n_anchored_docs
      FROM grams GROUP BY gram_md5
    )
    SELECT gram_md5, n_docs, n_anchored_docs
    FROM per_gram
    WHERE n_docs >= 2 AND n_anchored_docs >= 1
    """,
)
def duplicate_spans_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alignment-INVARIANT cross-document substring-duplication — the
    corrected form of ``duplicate_spans`` (whose fixed-stride sampling
    misses copies at offsets not congruent mod 8). Asymmetric
    detection: one side keeps every gram position (stride 1), the
    other only anchored positions (i % 8 == 1). Any duplicated span of
    length >= GRAM+STRIDE-1 = 31 contains an anchored gram in EVERY
    copy's coordinate system >= once per 8 chars — and the stride-1
    side carries the same gram content at whatever offset the other
    copy landed on, so the (gram, >=2 docs, >=1 anchored) predicate
    detects the pair regardless of relative alignment.

    Scale shape: the stride-1 side is ~len rows per doc — the classic
    space/recall trade of join-based substring dedup (the alternative
    is a distributed suffix array). It is generated map-side from the
    scan and hits ONE hash shuffle on the 16-byte gram hash; no join
    of document against document ever happens."""
    docs = load_table(spark, sf_dir, "documents")
    # ~len(text) md5 evaluations per doc sit below the first exchange;
    # spread the pruned scan so the fold uses every core (no-op on a
    # parallel scan).
    grams = (
        spread_scan(
            docs.where(F.length("text") >= GRAM).select("doc_id", "text")
        )
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("text") - (GRAM - 1), F.lit(1))
            ).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            F.md5(
                F.substring(F.col("text"), F.col("i"), GRAM).cast("binary")
            ).alias("gram_md5"),
            ((F.col("i") % STRIDE) == 1).cast("int").alias("anchored"),
        )
    )
    return (
        grams.groupBy("gram_md5")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct(
                F.when(F.col("anchored") == 1, F.col("doc_id"))
            ).alias("n_anchored_docs"),
        )
        .where((F.col("n_docs") >= 2) & (F.col("n_anchored_docs") >= 1))
    )


CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_TOPK = 20


@register(
    "countmin_token_freq",
    sql=f"""
    WITH toks AS (
      SELECT t.tok FROM documents d
      CROSS JOIN LATERAL (SELECT unnest(string_split(d.text, ' ')) AS tok) t
      WHERE t.tok <> ''
    ),
    cms AS (
      SELECT j.j,
             CAST(('0x' || substring(md5(j.j || '|' || tok), 1, 8)) AS BIGINT)
               % {CMS_WIDTH} AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM toks CROSS JOIN (
        SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS j) j
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS true_freq
      FROM toks GROUP BY tok
      ORDER BY true_freq DESC, tok LIMIT {CMS_TOPK}
    )
    SELECT t.tok AS token, min(c.c) AS cms_est, t.true_freq
    FROM truth t
    CROSS JOIN (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS j) j
    JOIN cms c
      ON c.j = j.j
     AND c.bucket = CAST(('0x' || substring(md5(j.j || '|' || t.tok), 1, 8))
                         AS BIGINT) % {CMS_WIDTH}
    GROUP BY t.tok, t.true_freq
    """,
)
def countmin_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) as pure
    relational ops: d={CMS_DEPTH} hash rows x w={CMS_WIDTH} buckets.
    Build = one map-side explode of (row, bucket) keys + one hash
    aggregate — the sketch is a {CMS_DEPTH}x{CMS_WIDTH} table of
    mergeable counters, which is the whole point at 100 TB: partial
    sketches combine by cell-wise addition in the same shuffle that
    builds them, raw tokens never move twice. Probe = broadcast-size
    join of the top-{CMS_TOPK} tokens against the sketch, min over
    rows. The oracle recomputes sketch AND truth, so the gate also
    pins the overestimate property (cms_est >= true_freq) on real
    data; the Hypothesis test generalizes it."""
    docs = load_table(spark, sf_dir, "documents")
    # CMS_DEPTH md5 draws per token sit below the groupBy exchange;
    # spread the single-split scan (no-op on a parallel scan)
    toks = spread_scan(docs.select("text")).select(
        F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    j = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("j")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("j"), F.col("tok"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % CMS_WIDTH
    )
    cms = (
        toks.select("tok", j)
        .select("j", bucket.alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("c"))
    )
    truth = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("true_freq"))
        .orderBy(F.col("true_freq").desc(), "tok")
        .limit(CMS_TOPK)
        .withColumnRenamed("tok", "token")
    )
    probes = truth.select(
        "token", "true_freq", F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("j")
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("j"), F.col("token"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % CMS_WIDTH,
    )
    return (
        probes.join(F.broadcast(cms), on=["j", "bucket"])
        .groupBy("token", "true_freq")
        .agg(F.min("c").alias("cms_est"))
        .select("token", "cms_est", "true_freq")
    )


@register(
    "dsir_importance_weights",
    sql="""
    WITH toks AS (
      SELECT d.doc_id, d.lang, t.tok FROM documents d
      CROSS JOIN LATERAL (SELECT unnest(string_split(d.text, ' ')) AS tok) t
      WHERE t.tok <> ''
    ),
    vocab AS (
      SELECT tok,
             CAST(count(*) AS BIGINT) AS n_src,
             CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS n_tgt
      FROM toks GROUP BY tok
    ),
    totals AS (
      SELECT CAST(sum(n_src) AS BIGINT) AS tot_src,
             CAST(sum(n_tgt) AS BIGINT) AS tot_tgt,
             CAST(count(*) AS BIGINT) AS v
      FROM vocab
    ),
    scored AS (
      SELECT t.doc_id,
             sum(ln((CAST(v.n_tgt + 1 AS DOUBLE) / (tot.tot_tgt + tot.v))
                    / (CAST(v.n_src + 1 AS DOUBLE) / (tot.tot_src + tot.v))))
               AS logw,
             CAST(count(*) AS BIGINT) AS n_tokens
      FROM toks t JOIN vocab v USING (tok) CROSS JOIN totals tot
      GROUP BY t.doc_id
    )
    -- + 0.0 flushes IEEE -0.0 (engines disagree on the sign of a
    -- rounded tiny negative)
    SELECT doc_id, round(logw / n_tokens, 4) + 0.0 AS avg_log_ratio, n_tokens
    FROM scored
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting (Xie et al., "Data Selection
    for Language Models via Importance Resampling", arXiv:2302.03169):
    score every document by the average log-ratio of an add-1-smoothed
    unigram LM fit on the TARGET distribution (here: lang='en' docs)
    vs one fit on the full SOURCE corpus. Documents whose token mix
    resembles the target get high scores; resampling by these weights
    shifts the corpus toward the target domain.

    Scale shape: both LMs come out of ONE token aggregation (the
    target count is a conditional count inside the same groupBy — no
    second corpus pass); the model totals are a 1-row broadcast
    cross-join; scoring is the token->vocab equi-join every LM-quality
    query in this repo uses (pre-shuffle pruning applies). Per-token
    ratios are summed then averaged per doc: length-normalized so long
    docs don't dominate, rounded at 4dp for cross-engine parity."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("tok"),
    ).where(F.col("tok") != "")
    vocab = toks.groupBy("tok").agg(
        F.count("*").alias("n_src"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("n_tgt"),
    )
    totals = vocab.agg(
        F.sum("n_src").alias("tot_src"),
        F.sum("n_tgt").alias("tot_tgt"),
        F.count("*").alias("v"),
    )
    ratio = F.log(
        ((F.col("n_tgt") + 1).cast("double") / (F.col("tot_tgt") + F.col("v")))
        / ((F.col("n_src") + 1).cast("double") / (F.col("tot_src") + F.col("v")))
    )
    return (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.sum(ratio).alias("logw"),
            F.count("*").alias("n_tokens"),
        )
        .select(
            "doc_id",
            (F.round(F.col("logw") / F.col("n_tokens"), 4) + F.lit(0.0)).alias(
                "avg_log_ratio"
            ),
            "n_tokens",
        )
    )


@register(
    "touch_attribution",
    sql="""
    WITH touches AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('view', 'click')
    ),
    purchases AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase'
    ),
    last_ts AS (
      SELECT p.user_id, p.event_id AS purchase_id, p.value,
             max(t.ts) AS touch_ts
      FROM purchases p JOIN touches t
        ON t.user_id = p.user_id AND t.ts < p.ts
      GROUP BY p.user_id, p.event_id, p.value
    ),
    attributed AS (
      SELECT l.purchase_id, l.value,
             min_by(t.event_type, t.event_id) AS touch_type
      FROM last_ts l JOIN touches t
        ON t.user_id = l.user_id AND t.ts = l.touch_ts
      GROUP BY l.purchase_id, l.value
    )
    SELECT touch_type,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(CAST(sum(value) AS DECIMAL(18,2)) + 0.0, 2)
             AS attributed_value
    FROM attributed GROUP BY touch_type
    """,
)
def touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited
    to the user's most recent preceding view/click. Two-phase exact
    argmax — (1) per-purchase max touch timestamp via an equi-join on
    user_id with a ts range predicate, (2) re-join on the exact
    (user, ts) to recover the touch type, min event_id breaking
    same-microsecond ties deterministically. Both shuffles are keyed
    on user_id, so at scale this is one partitioning reused twice;
    the touch frame is events-sized but carries 4 columns. Value sums
    go through DECIMAL so engines agree on cents."""
    ev = load_table(spark, sf_dir, "events")
    touches = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id", "ts", "event_id", "event_type"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    last_ts = (
        purchases.alias("p")
        .join(
            touches.alias("t"),
            (F.col("t.user_id") == F.col("p.user_id"))
            & (F.col("t.ts") < F.col("p.ts")),
        )
        .groupBy(
            F.col("p.user_id").alias("user_id"),
            F.col("p.event_id").alias("purchase_id"),
            F.col("p.value").alias("value"),
        )
        .agg(F.max(F.col("t.ts")).alias("touch_ts"))
    )
    attributed = (
        last_ts.alias("l")
        .join(
            touches.alias("t"),
            (F.col("t.user_id") == F.col("l.user_id"))
            & (F.col("t.ts") == F.col("l.touch_ts")),
        )
        .groupBy(F.col("l.purchase_id"), F.col("l.value"))
        .agg(F.min_by(F.col("t.event_type"), F.col("t.event_id")).alias("touch_type"))
    )
    return attributed.groupBy("touch_type").agg(
        F.count("*").alias("n_purchases"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("attributed_value"),
    )


BFS_HOPS = 3


@register(
    "bfs_reachable_parts",
    sql=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    ),
    seeds AS (
      SELECT DISTINCT l_partkey AS node FROM lineitem
      WHERE l_partkey % 1000 = 0
    ),
    h1 AS (
      SELECT DISTINCT e.v AS node FROM edges e JOIN seeds s ON e.u = s.node
    ),
    h2 AS (
      SELECT DISTINCT e.v AS node FROM edges e JOIN h1 ON e.u = h1.node
    ),
    h3 AS (
      SELECT DISTINCT e.v AS node FROM edges e JOIN h2 ON e.u = h2.node
    ),
    all_hops AS (
      SELECT node, 0 AS hops FROM seeds
      UNION ALL SELECT node, 1 FROM h1
      UNION ALL SELECT node, 2 FROM h2
      UNION ALL SELECT node, 3 FROM h3
    )
    SELECT CAST(hops AS INT) AS hops,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM (SELECT node, min(hops) AS hops FROM all_hops GROUP BY node)
    GROUP BY 1
    """,
)
def bfs_reachable_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS over the co-purchase graph: how many parts
    are first reachable at 1, 2, 3 hops from the seed set
    (partkey % 1000 == 0). Frontier expansion is the textbook
    distributed BFS: per hop, ONE equi-join of the current frontier
    against the edge list + an anti-join... expressed here as
    min-hops aggregation so the whole thing is joins/groupBys (no
    driver loop state beyond the {BFS_HOPS} fixed hops). At scale the
    edge list is hash-partitioned on src once and every hop reuses
    that partitioning; frontiers are node-sized."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    seeds = (
        li.where(F.col("l_partkey") % 1000 == 0)
        .select(F.col("l_partkey").alias("node"))
        .distinct()
    )
    hops_frames = [seeds.withColumn("hops", F.lit(0))]
    frontier = seeds
    for h in range(1, BFS_HOPS + 1):
        frontier = (
            edges.join(frontier, edges.u == frontier.node)
            .select(F.col("v").alias("node"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        hops_frames.append(frontier.withColumn("hops", F.lit(h)))
    all_hops = hops_frames[0]
    for f in hops_frames[1:]:
        all_hops = all_hops.unionAll(f)
    return (
        all_hops.groupBy("node")
        .agg(F.min("hops").alias("hops"))
        .groupBy(F.col("hops").cast("int").alias("hops"))
        .agg(F.count("*").alias("n_nodes"))
    )


@register(
    "mad_robust_anomaly",
    sql="""
    WITH med AS (
      SELECT event_type,
             round(CAST(median(value) AS DOUBLE), 6) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, round(abs(e.value - m.med), 6) AS dev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type,
             round(CAST(median(dev) AS DOUBLE), 6) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(CASE WHEN d.dev > round(3 * 1.4826 * m.mad, 6)
                      THEN 1 END) AS BIGINT) AS n_anomalies,
           any_value(me.med) AS med,
           any_value(m.mad) AS mad
    FROM dev d JOIN mad m USING (event_type) JOIN med me USING (event_type)
    GROUP BY d.event_type
    """,
)
def mad_robust_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection via Median Absolute Deviation: flag
    values whose deviation from the per-type median exceeds
    3 * 1.4826 * MAD (the normal-consistency constant). Unlike the
    z-score variant (zscore_anomaly_events), a few extreme values
    cannot inflate the threshold — median and MAD have 50% breakdown.

    Two median passes (exact percentile — at 100 TB swap in the KLL
    sketch path from kll_quantile_sketch_prices; the query shape is
    identical), each a groupBy on event_type; the per-type medians
    broadcast back onto the events. Medians and deviations are
    rounded at fixed precision BEFORE the threshold compare so both
    engines make the same keep/flag decision at the boundary."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.round(F.abs(F.col("value") - F.col("med")), 6).alias("dev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(dev, 0.5)"), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count(
                F.when(
                    F.col("dev") > F.round(3 * 1.4826 * F.col("mad"), 6), 1
                )
            ).alias("n_anomalies"),
            F.any_value("med").alias("med"),
            F.any_value("mad").alias("mad"),
        )
    )


BPE_TOPK = 50


@register(
    "bpe_merge_candidates",
    sql=f"""
    WITH toks AS (
      SELECT t.tok FROM documents d
      CROSS JOIN LATERAL (SELECT unnest(string_split(d.text, ' ')) AS tok) t
      WHERE length(t.tok) >= 2
    ),
    pairs AS (
      SELECT substring(tok, i, 2) AS pair
      FROM toks
      CROSS JOIN LATERAL (
        SELECT unnest(generate_series(1, length(tok) - 1, 1)) AS i
      )
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT {BPE_TOPK}
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inner loop of BPE tokenizer training: count every adjacent
    symbol pair inside tokens and rank merge candidates (the highest
    count is the pair BPE would merge next). Map-side explode of
    (position -> 2-gram) then ONE hash aggregate; the candidate
    ranking is a bounded top-{BPE_TOPK} (TakeOrderedAndProject, no
    global sort). At 100 TB the aggregate's key space is |alphabet|^2
    — tiny — so map-side partial aggregation collapses almost all of
    the shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).where(F.length("tok") >= 2)
    pairs = toks.select(
        F.explode(
            F.sequence(F.lit(1), F.length("tok") - 1, F.lit(1))
        ).alias("i"),
        "tok",
    ).select(F.substring(F.col("tok"), F.col("i"), 2).alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(BPE_TOPK)
    )

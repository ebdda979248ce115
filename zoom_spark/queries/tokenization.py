"""Round-6 tokenization queries (R149–R150): BPE apply + token-exact
shard packing.

The round-5 verdict's "Next round" #7: R68 produced BPE merge
CANDIDATES but nothing applied a merge table, and the shard packers
packed by word/char counts. Pretrain pipelines pack by TOKENS — so
these two queries wire functions/bpe.py's trained merge table through
a distributed greedy encode and feed the token counts into the
two-phase prefix-sum packer (operators/prefix.pack_by_budget).

Greedy BPE merging is not SQL-expressible — both gates are rows-only;
correctness is pinned by an independent pure-Python referee
implementing the ORIGINAL iterate-merges-in-order formulation
(tests/test_tokenization.py) plus packing-budget properties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.functions.bpe import bpe_encode_docs, train_bpe_merges
from zoom_spark.io import load_table
from zoom_spark.queries import register

BPE_N_MERGES = 200
BPE_SAMPLE_DOCS = 200
TOKEN_BUDGET = 2048  # tokens per packed shard


def _encoded_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe_merges(
        docs, n_merges=BPE_N_MERGES, sample_docs=BPE_SAMPLE_DOCS
    )
    return bpe_encode_docs(docs, merges)


@register("bpe_token_counts")  # greedy merge apply: rows-only + referee
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE token counts under a merge table trained on a
    deterministic 200-doc sample: (doc_id, n_words, n_tokens,
    first_word_tokens). n_tokens <= chars+words by construction (every
    merge shrinks a word; the marker adds one per word) — the token
    accounting a packing/costing stage consumes."""
    return _encoded_docs(spark, sf_dir)


@register(
    "pack_shards_token_budget",
    sql=f"""
    WITH w AS (
      SELECT doc_id,
             greatest(1, CAST(ceil(length(text) / 4.0) AS BIGINT))
               AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS excl
      FROM w
    )
    SELECT doc_id, n_tokens,
           CAST(floor(CAST(excl AS DOUBLE) / {TOKEN_BUDGET}) AS BIGINT)
             AS shard_id
    FROM c
    """,
)
def pack_shards_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted shard packing: assign docs (in doc_id order) to
    consecutive shards of ~TOKEN_BUDGET tokens via the two-phase
    prefix-sum packer (operators/prefix.pack_by_budget) — the
    sequence-packing step of a pretrain pipeline.

    Oracle-hashed since round 10 (r9 verdict #6): the packer itself
    (shard = floor(exclusive_prefix / budget)) is deterministic given
    the weights, so gating it on an ENGINE-PORTABLE token estimate —
    the standard ~4-chars-per-token heuristic, greatest(1,
    ceil(len/4)) — converts the whole packing contract to a DuckDB
    value hash (the oracle replays the prefix sum as a window).  The
    BPE-exact weight variant stays pytest-proven (greedy BPE is not
    SQL-expressible): test_pack_by_budget_bpe_weights packs the same
    docs by bpe_token_counts' n_tokens through the same operator."""
    from zoom_spark.operators.prefix import pack_by_budget

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.greatest(
            F.lit(1),
            F.ceil(F.length("text") / 4.0).cast("bigint"),
        ).alias("n_tokens"),
    )
    return pack_by_budget(
        docs, order_col="doc_id", weight_col="n_tokens", budget=TOKEN_BUDGET
    ).select(
        "doc_id",
        "n_tokens",
        F.col("shard_id").cast("bigint").alias("shard_id"),
    )

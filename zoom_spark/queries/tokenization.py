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


@register("pack_shards_token_budget")  # prefix-sum packing: rows-only
def pack_shards_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted shard packing: BPE-encode every doc, then assign
    docs (in doc_id order) to consecutive shards of ~TOKEN_BUDGET
    tokens via the two-phase prefix-sum packer — token-exact where the
    earlier pack_docs_into_shards packs by word count. Properties
    pinned in tests: shards are contiguous in doc order, every shard's
    token total fits the budget unless a single doc alone exceeds it."""
    from zoom_spark.operators.prefix import pack_by_budget

    enc = _encoded_docs(spark, sf_dir).select("doc_id", "n_tokens")
    return pack_by_budget(
        enc, order_col="doc_id", weight_col="n_tokens", budget=TOKEN_BUDGET
    ).select(
        "doc_id",
        "n_tokens",
        F.col("shard_id").cast("bigint").alias("shard_id"),
    )

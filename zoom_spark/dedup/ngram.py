"""N-gram Jaccard near-duplicate detection (X2 family).

Exact token-shingle Jaccard over candidate pairs. The pair space is
bounded by a blocking key (here: a cheap attribute like language, or
an LSH band from minhash.py) — never an unconstrained self cross
join. Set algebra is JVM-side (array_intersect/array_union on
distinct shingle arrays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zoom_spark.functions.text import ws_tokens


def shingles(text_col, n: int = 3):
    """Distinct word n-gram shingles of the lowercased token stream.

    Sliding window via a zip_with fold over shifted copies of the
    token array: gram[i] = toks[i] + " " + toks[i+1] + ... — two
    string concats per position instead of a per-position
    slice+concat_ws (which allocated an n-element array per shingle
    and measured ~5.4 s of a 7.9 s MinHash pass at sf0.1). Lowercase
    is applied to the whole string once, not per token (identical
    tokens: lowercasing never creates or removes whitespace).

    zip_with pads the shorter side with nulls and concat_ws skips
    nulls, so positions past n_tok-n+1 hold partial grams — the final
    slice drops them (docs with fewer than n tokens yield an empty
    array, matching the oracle's generate_series upper bound)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = ws_tokens(F.lower(c))
    n_tok = F.size(toks)
    gram = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(n_tok - k, F.lit(0)))
        gram = F.zip_with(gram, shifted, lambda a, b: F.concat_ws(" ", a, b))
    full = F.slice(gram, 1, F.greatest(n_tok - (n - 1), F.lit(0)))
    return F.array_distinct(full)


def jaccard(a, b):
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) within a blocking key whose
    n-gram Jaccard >= threshold. Output: id_a, id_b, jaccard_sim."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        shingles(F.col(text_col), n).alias("sh"),
    )
    a = sh.select(
        F.col("id").alias("id_a"), F.col("blk"), F.col("sh").alias("sh_a")
    )
    b = sh.select(
        F.col("id").alias("id_b"), F.col("blk"), F.col("sh").alias("sh_b")
    )
    pairs = a.join(b, on="blk").where(F.col("id_a") < F.col("id_b"))
    sim = F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6)
    return (
        pairs.select("id_a", "id_b", sim.alias("jaccard_sim"))
        .where(F.col("jaccard_sim") >= threshold)
    )

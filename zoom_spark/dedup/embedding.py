"""Embedding-cosine near-duplicate detection (X2 family, vectors).

Exact variant: blocked self-join + cosine threshold (block on a
cheap partition key to bound the pair space). Scale variant: random
hyperplane LSH (sign bits of projections) — cosine-preserving
bucketing, same band-join shape as minhash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zoom_spark.functions.vectors import cosine_with_norms, norm


def cosine_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    block_col: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs (id_a < id_b) with round(cosine,6) >= threshold; blocked
    self-join when block_col given, full self-join otherwise."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("nrm"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    a = base.select(
        *(["blk"] if block_col else []),
        F.col("id").alias("id_a"), F.col("v").alias("v_a"),
        F.col("nrm").alias("n_a"),
    )
    b = base.select(
        *(["blk"] if block_col else []),
        F.col("id").alias("id_b"), F.col("v").alias("v_b"),
        F.col("nrm").alias("n_b"),
    )
    on = ["blk"] if block_col else None
    pairs = (a.join(b, on=on) if on else a.crossJoin(b)).where(
        F.col("id_a") < F.col("id_b")
    )
    sim = F.round(
        cosine_with_norms(F.col("v_a"), F.col("v_b"), F.col("n_a"), F.col("n_b")), 6
    )
    return pairs.select("id_a", "id_b", sim.alias("cosine_sim")).where(
        F.col("cosine_sim") >= threshold
    )

"""Vector column functions (embedding similarity) — pure higher-order
expressions (zip_with + aggregate), JVM-side, no UDF
(BASELINE.json north-star X3; PAPERS.md similarity-search background).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either norm is 0."""
    d = dot(a, b)
    denom = norm(a) * norm(b)
    return F.when(denom > 0, d / denom).otherwise(F.lit(0.0))


def cosine_with_norms(va: Column, vb: Column, na: Column, nb: Column) -> Column:
    """cosine(va, vb) with the norms supplied as columns. Computing
    norm(v) once per ROW before a pair join — instead of once per
    PAIR inside it — cuts the pair-stage fold work 3× and is bitwise
    identical (same ops over the same inputs, so rounded similarities
    cannot move)."""
    d = dot(va, vb)
    denom = na * nb
    return F.when(denom > 0, d / denom).otherwise(F.lit(0.0))

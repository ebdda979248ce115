"""Jaro / Jaro-Winkler string similarity — the record-linkage metric
(Fellegi-Sunter tradition) complementing the Levenshtein family.

Spark has no builtin Jaro-Winkler, so this is a REAL pure-Python
implementation of the textbook algorithm (matching window
floor(max/2)−1, half-transpositions, Winkler prefix boost p·0.1·(1−j)
for prefixes up to 4 applied when jaro > 0.7), exposed as an
Arrow-batched pandas UDF. The DuckDB oracle verifies it with its OWN
independent C++ `jaro_winkler_similarity` — the referee discipline's
strongest form (two unrelated implementations, bit-identical output:
pinned over the full name-vocabulary pair set in tests).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def jaro(s1: str, s2: str) -> float:
    """Jaro similarity; 0.0 when either side is empty (DuckDB's
    convention, which this repo's oracle contract follows)."""
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    md = max(len(s1), len(s2)) // 2 - 1
    m1 = [False] * len(s1)
    m2 = [False] * len(s2)
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - md), min(len(s2), i + md + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len(s1)):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (
        matches / len(s1) + matches / len(s2) + (matches - t) / matches
    ) / 3


def jaro_winkler(s1: str, s2: str, boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler: prefix-boosted Jaro (boost only above the
    threshold, prefix capped at 4 — the standard parameters DuckDB
    also implements)."""
    j = jaro(s1, s2)
    if j <= boost_threshold:
        return j
    p = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            p += 1
        else:
            break
    return j + p * 0.1 * (1 - j)


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [jaro_winkler(x or "", y or "") for x, y in zip(a, b)],
        dtype="float64",
    )

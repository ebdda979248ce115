"""Exact threshold heavy hitters via local-candidate pruning (§2.4 /
§2.11 extension — the "what are the dominant tokens/domains/URLs"
pass every corpus audit runs; same pruning idea as Misra-Gries /
SpaceSaving summaries, but completed to EXACT answers).

Two-phase shape:
  1. candidate generation — each partition emits only the values that
     are heavy WITHIN it (local_freq * k > partition_size). By the
     pigeonhole argument, any value with global freq > N/k must be
     locally heavy in at least one partition, so the union of local
     candidates is a SUPERSET of the true answer. Everything else is
     filtered before it ever shuffles.
  2. exact recount — the token stream is semi-joined (broadcast: the
     candidate set is at most k per partition, typically far less) to
     candidates and exactly counted; the final integer filter
     freq * k > N needs no floats.

Scale: the full stream is scanned twice but shuffled never (phase 1
is map-only; phase 2 shuffles only candidate-matching rows, at most
~k distinct keys). Memory per task in phase 1 is the partition's
distinct count — swap the pandas value_counts for a bounded
Misra-Gries dict (same guarantee) if partitions are adversarially
wide. Compare: a naive groupBy shuffles every distinct value.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def local_candidates(values: DataFrame, col: str, k: int) -> DataFrame:
    """One row per locally-heavy value (freq * k > partition rows).

    The mapInPandas output schema is derived from the input column's
    type (not hardcoded to string) so non-string keys — bigint ids,
    dates — round-trip without Arrow schema mismatches or silent
    coercion."""
    col_type = values.schema[col].dataType.simpleString()

    def heavy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        n = 0
        for b in batches:
            n += len(b)
            for v, c in b[col].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
        cand = [v for v, c in counts.items() if c * k > n]
        if cand:
            yield pd.DataFrame({col: cand})

    return (
        values.select(col).mapInPandas(heavy, f"{col} {col_type}").distinct()
    )


def threshold_heavy_hitters(values: DataFrame, col: str, k: int) -> DataFrame:
    """(value, freq) for every value with freq * k > total rows —
    exact, via local-candidate pruning then candidate-only recount."""
    cand = local_candidates(values, col, k)
    total = values.agg(F.count("*").alias("total"))
    return (
        values.join(F.broadcast(cand), col)
        .groupBy(col)
        .agg(F.count("*").alias("freq"))
        .crossJoin(F.broadcast(total))
        .where(F.col("freq") * k > F.col("total"))
        .select(col, "freq")
    )

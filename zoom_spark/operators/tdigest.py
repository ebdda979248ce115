"""t-digest quantile sketch (Dunning's merging digest) — the classic
mergeable quantile summary complementing the repo's KLL gate: centroid
clusters sized by the k2-style bound w ≤ 4·N·q(1−q)/δ, so resolution
concentrates at the tails (where KLL's uniform guarantee is loosest).

Spark shape — the canonical mergeable-sketch pipeline:
  1. map stage: each partition sorts its values once and compresses
     them into ≤ O(δ) centroids (Arrow-batched mapInPandas);
  2. reduce stage: the P·O(δ) partial centroids — MODEL-sized, like
     broadcast join keys — merge in one final compress;
  3. quantile queries interpolate between centroid means.
Centroid merging is order-sensitive (inherent to the sketch — two
ingest orders give different but equally-accurate digests), so the
gate is rows-only with rank-accuracy property tests rather than a
value oracle.

No analog in the reference connector (SURVEY.md §2.11 extension
family).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TDIGEST_DELTA = 100.0


def compress(
    centroids: list[tuple[float, float]], delta: float = TDIGEST_DELTA
) -> list[tuple[float, float]]:
    """One merging pass over (mean, weight) clusters in value order,
    greedily merging neighbors while the k2-style size bound
    w ≤ 4·N·q(1−q)/δ holds at the merged cluster's mid-quantile."""
    if not centroids:
        return []
    centroids = sorted(centroids)
    total = sum(w for _, w in centroids)
    out: list[tuple[float, float]] = []
    cm, cw = centroids[0]
    q0 = 0.0  # cumulative weight fraction strictly before current
    for m, w in centroids[1:]:
        q_mid = q0 + (cw + w) / (2 * total)
        limit = 4 * total * q_mid * (1 - q_mid) / delta
        if cw + w <= max(limit, 1.0):
            cm = (cm * cw + m * w) / (cw + w)
            cw += w
        else:
            out.append((cm, cw))
            q0 += cw / total
            cm, cw = m, w
    out.append((cm, cw))
    return out


def quantile(centroids: list[tuple[float, float]], q: float) -> float:
    """Interpolated quantile from a compressed digest (midpoint rule
    between consecutive centroid means)."""
    if not centroids:
        raise ValueError("empty digest")
    total = sum(w for _, w in centroids)
    target = q * total
    cum = 0.0
    prev_mean, prev_mid = None, None
    for m, w in centroids:
        mid = cum + w / 2
        if target < mid:
            if prev_mean is None:
                return m
            frac = (target - prev_mid) / (mid - prev_mid)
            return prev_mean + frac * (m - prev_mean)
        prev_mean, prev_mid = m, mid
        cum += w
    return centroids[-1][0]


def tdigest_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    delta: float = TDIGEST_DELTA,
) -> DataFrame:
    """Distributed t-digest: per-partition compress (map), one
    model-sized merge (reduce on a constant key), quantile rows out."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vals: list[float] = []
        for pdf in batches:
            vals.extend(float(v) for v in pdf[value_col].dropna())
        if vals:
            cents = compress([(v, 1.0) for v in vals], delta)
            yield pd.DataFrame(
                {
                    "mean": [c[0] for c in cents],
                    "weight": [c[1] for c in cents],
                }
            )

    partials = df.select(value_col).mapInPandas(
        partial, schema="mean double, weight double"
    )

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = compress(
            list(zip(pdf["mean"], pdf["weight"])), delta
        )
        return pd.DataFrame(
            {
                "q": qs,
                "est": [quantile(cents, q) for q in qs],
                "n_centroids": [len(cents)] * len(qs),
            }
        )

    return (
        partials.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(final, schema="q double, est double, n_centroids bigint")
    )

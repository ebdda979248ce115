"""Distributed PCA over an embedding column (X3/X5 extension —
dimensionality reduction for ANN indexing, semantic dedup, and
whitening before clustering; standard covariance-eigendecomposition
PCA, no external ML dependency).

Scale design (what survives 100 TB):
  * the ONLY distributed work is the moment computation: each input
    partition reduces to a single (n, sum_x[d], sum_xxT[d*d]) row
    inside an Arrow-batched mapInPandas pass — numpy does the
    per-batch X^T X in BLAS — and only those P tiny rows leave the
    executors. Nothing data-sized shuffles or collects.
  * the driver-side step is O(d^2) memory and O(d^3) eigh — model
    fitting on a d x d matrix (d = embedding width, 64 here; even
    d = 4096 is a 128 MB matrix), exactly like collecting k-means
    centroids: a model artifact, not data.
  * projection is a pure JVM-side expression (one zip_with dot per
    component with the component as a literal array) — codegen'd, no
    Python in the per-row path.

Sign convention: each eigenvector is flipped so its
largest-magnitude coordinate is positive — eigh's sign is otherwise
arbitrary and would make projections partitioning-dependent in sign.

Gate: float partial sums make low-order mean/eigen bits
partitioning-sensitive, so the gated query is rows-only; the math is
covered by property tests (orthonormal components, eigenvalue ==
projected variance, planted-subspace recovery) in tests/test_pca.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_pca(
    df: DataFrame, vec_col: str, *, n_components: int
) -> tuple[list[float], list[list[float]], list[float]]:
    """Returns (mean[d], components[q][d] row-major, eigenvalues[q])
    of the sample covariance of ``vec_col``."""
    first = df.select(vec_col).first()
    dim = len(first[0])

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        ss = np.zeros((dim, dim))
        for b in batches:
            x = np.array(b[vec_col].tolist(), dtype=np.float64)
            if len(x):
                n += len(x)
                s += x.sum(axis=0)
                ss += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, "n long, s array<double>, ss array<double>")
        .collect()
    )
    n = sum(r["n"] for r in rows)
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(dim, dim) for r in rows], axis=0)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = []
    for i in order:
        v = evecs[:, i]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append(v.tolist())
    return mean.tolist(), comps, [float(evals[i]) for i in order]


def project(
    df: DataFrame, vec_col: str, mean: list[float], components: list[list[float]]
) -> DataFrame:
    """``df`` plus a ``proj`` array column: (x - mean) . W_j per
    component, all JVM-side with model weights as literals."""
    centered = F.zip_with(
        F.col(vec_col),
        F.array(*[F.lit(float(m)) for m in mean]),
        lambda x, m: x - m,
    )
    projs = [
        F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(w)) for w in comp]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for comp in components
    ]
    return df.withColumn("proj", F.array(*projs))

"""Product quantization ANN (X3 scale path #3, completing the
IVF-flat / LSH family with the memory-bound regime: Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011 —
public paper, re-expressed Spark-first).

Why PQ at 100 TB: IVF-flat still stores full vectors (d floats); PQ
stores m small codes (m bytes at k<=256) — a 32x compression for
d=64/m=8 — so the candidate scan is memory-bandwidth-cheap and the
distance evaluation is m table lookups instead of a d-wide fold.

Spark mapping:
  * TRAINING: all m sub-codebooks are fitted SIMULTANEOUSLY by one
    Lloyd's loop whose E+M step is a single mapInPandas pass per
    iteration — each partition emits at most m*k partial rows
    (per-(subspace, code) vector sum + count), numpy/BLAS inside the
    batch. One job per iteration, NOT one k-means per subspace.
    Codebooks are a model artifact (m*k*(d/m) = k*d floats).
  * ENCODING: mapInPandas argmin per subspace (vectorized distance
    matrix per Arrow batch); output array<int> codes, map-only.
  * SEARCH (ADC): the query's distance lookup table (m x k, tiny) is
    embedded as a literal; the per-row approximate distance is a
    JVM-side fold of m element_at lookups — whole-stage codegen, no
    Python in the scan, no shuffle except the final top-k.

Quantization is float-sensitive (argmin ties, partial-sum order), so
gated queries are rows-only; exactness is covered by property tests:
zero-quantization-error corpora give ADC == exact L2, recall on
planted neighbors, and monotone distortion per training iteration
(tests/test_pq.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from zoom_spark.similarity.ivf import sample_centroids


def _slice_subspaces(x: np.ndarray, m: int) -> np.ndarray:
    """(N, d) -> (m, N, d/m)."""
    n, d = x.shape
    return x.reshape(n, m, d // m).transpose(1, 0, 2)


def train_pq(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    m: int = 8,
    k: int = 16,
    max_iter: int = 4,
) -> tuple[list, list[float]]:
    """Fit m sub-codebooks of k centroids each. Returns
    (codebooks[m][k][d/m], distortion_per_iteration). Seeds are a
    deterministic hash-ordered vector sample sliced subspace-wise."""
    first = df.select(vec_col).first()
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    ds = dim // m
    seeds = np.array(sample_centroids(df, vec_col, id_col, k))  # (k, d)
    books = _slice_subspaces(seeds, m)  # (m, k, ds)
    distortions: list[float] = []
    for _ in range(max_iter):
        bks = books  # capture current iteration's codebooks

        def estep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            n_rows = 0
            err = 0.0
            sums = np.zeros((m, k, ds))
            counts = np.zeros((m, k), dtype=np.int64)
            for b in batches:
                x = np.array(b[vec_col].tolist(), dtype=np.float64)
                if not len(x):
                    continue
                n_rows += len(x)
                xs = _slice_subspaces(x, m)  # (m, N, ds)
                for j in range(m):
                    # (N, k) squared distances via BLAS
                    d2 = (
                        (xs[j] ** 2).sum(1)[:, None]
                        - 2.0 * xs[j] @ bks[j].T
                        + (bks[j] ** 2).sum(1)[None, :]
                    )
                    code = d2.argmin(1)
                    err += float(d2[np.arange(len(code)), code].sum())
                    np.add.at(sums[j], code, xs[j])
                    np.add.at(counts[j], code, 1)
            if n_rows:
                yield pd.DataFrame(
                    {
                        "n": [n_rows],
                        "err": [err],
                        "sums": [sums.reshape(-1).tolist()],
                        "counts": [counts.reshape(-1).tolist()],
                    }
                )

        rows = (
            df.select(vec_col)
            .mapInPandas(
                estep,
                "n long, err double, sums array<double>, counts array<long>",
            )
            .collect()
        )
        sums = np.sum([np.array(r["sums"]).reshape(m, k, ds) for r in rows], axis=0)
        counts = np.sum(
            [np.array(r["counts"]).reshape(m, k) for r in rows], axis=0
        )
        distortions.append(float(sum(r["err"] for r in rows)))
        new = books.copy()
        nonzero = counts > 0
        for j in range(m):
            new[j][nonzero[j]] = sums[j][nonzero[j]] / counts[j][nonzero[j], None]
        books = new
    return books.tolist(), distortions


def encode_pq(
    df: DataFrame, vec_col: str, id_col: str, codebooks
) -> DataFrame:
    """(id, codes[m]) — map-only vectorized argmin per subspace."""
    books = np.array(codebooks)
    m, k, ds = books.shape

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            x = np.array(b[vec_col].tolist(), dtype=np.float64)
            xs = _slice_subspaces(x, m)
            codes = np.stack(
                [
                    (
                        (xs[j] ** 2).sum(1)[:, None]
                        - 2.0 * xs[j] @ books[j].T
                        + (books[j] ** 2).sum(1)[None, :]
                    ).argmin(1)
                    for j in range(m)
                ],
                axis=1,
            )  # (N, m)
            yield pd.DataFrame(
                {"id": b[id_col].values, "codes": list(codes.astype(int))}
            )

    return df.select(F.col(id_col).alias(id_col), vec_col).mapInPandas(
        enc, f"id long, codes array<int>"
    )


def adc_distance(codes_col, query: list[float], codebooks) -> "F.Column":
    """JVM-side asymmetric distance: sum over subspaces of the
    precomputed ||q_j - codebook[j][c]||^2 lookup — m element_at
    lookups per row against a literal m x k table, codegen'd."""
    books = np.array(codebooks)
    m, k, ds = books.shape
    q = np.array(query).reshape(m, ds)
    lut = [
        [float(((q[j] - books[j][c]) ** 2).sum()) for c in range(k)]
        for j in range(m)
    ]
    lut_lit = F.array(
        *[F.array(*[F.lit(v) for v in row]) for row in lut]
    )
    return F.aggregate(
        F.zip_with(
            lut_lit,
            codes_col,
            lambda row, c: F.element_at(row, c + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_topk(
    encoded: DataFrame,
    queries: list[tuple[int, list[float]]],
    codebooks,
    *,
    k_neighbors: int = 10,
) -> DataFrame:
    """(query_id, id, adc_dist, rank) top-k per query over the
    encoded corpus. One ADC scan per query, unioned — each scan is a
    map + TakeOrdered top-k, no shuffle of the corpus; the loop is
    over the (small) query set, mirroring knn.py's broadcast design."""
    per_query = []
    for qid, qv in queries:
        per_query.append(
            encoded.select(
                F.lit(int(qid)).alias("query_id"),
                "id",
                F.round(adc_distance(F.col("codes"), qv, codebooks), 6).alias(
                    "adc_dist"
                ),
            )
        )
    scans = per_query[0]
    for p in per_query[1:]:
        scans = scans.unionAll(p)
    w = Window.partitionBy("query_id").orderBy("adc_dist", "id")
    return (
        scans.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_neighbors)
        .select("query_id", "id", "adc_dist", "rank")
    )

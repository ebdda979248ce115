"""Property tests for product quantization (similarity/pq.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from zoom_spark.similarity.pq import adc_distance, encode_pq, pq_topk, train_pq


def _df(spark, x, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, row.tolist()) for i, row in enumerate(np.asarray(x))],
        "vec_id long, v array<double>",
    )


def test_train_distortion_monotone_nonincreasing(spark):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(300, 16))
    df = _df(spark, x).repartition(5)
    _, distortions = train_pq(df, "v", "vec_id", m=4, k=8, max_iter=4)
    assert len(distortions) == 4
    for a, b in zip(distortions, distortions[1:]):
        assert b <= a + 1e-9


def test_adc_exact_when_zero_quantization_error(spark):
    """Corpus built as the cartesian product of codebook entries has
    zero quantization error, so ADC distance == exact L2 distance."""
    rng = np.random.default_rng(1)
    # 2 subspaces of width 2, 3 codes each -> 9 exactly-representable vectors
    books = rng.normal(size=(2, 3, 2))
    corpus = np.array(
        [np.concatenate([books[0][a], books[1][b]]) for a in range(3) for b in range(3)]
    )
    df = _df(spark, corpus)
    encoded = encode_pq(df, "v", "vec_id", books.tolist())
    q = rng.normal(size=4)
    got = {
        r["id"]: r["d"]
        for r in encoded.select(
            "id", adc_distance(F.col("codes"), q.tolist(), books.tolist()).alias("d")
        ).collect()
    }
    for i, row in enumerate(corpus):
        assert abs(got[i] - float(((q - row) ** 2).sum())) < 1e-9


def test_pq_topk_recall_on_clustered_data(spark):
    """Well-separated clusters: PQ top-k must retrieve same-cluster
    points before other-cluster points."""
    rng = np.random.default_rng(2)
    centers = rng.normal(size=(4, 16)) * 50.0
    pts = np.concatenate(
        [c + rng.normal(size=(25, 16)) for c in centers]
    )  # ids 0..99, cluster = id // 25
    df = _df(spark, pts).repartition(4)
    books, _ = train_pq(df, "v", "vec_id", m=4, k=16, max_iter=4)
    encoded = encode_pq(df, "v", "vec_id", books)
    queries = [(int(i), pts[i].tolist()) for i in (0, 30, 60, 90)]
    out = pq_topk(encoded, queries, books, k_neighbors=10).collect()
    assert len(out) == 40
    for r in out:
        assert r["id"] // 25 == r["query_id"] // 25, (
            f"query {r['query_id']} retrieved cross-cluster neighbor {r['id']}"
        )


def test_encode_codes_shape_and_range(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(60, 8))
    df = _df(spark, x)
    books, _ = train_pq(df, "v", "vec_id", m=2, k=4, max_iter=2)
    rows = encode_pq(df, "v", "vec_id", books).collect()
    assert len(rows) == 60
    for r in rows:
        assert len(r["codes"]) == 2
        assert all(0 <= c < 4 for c in r["codes"])


# ---------- residual IVF-PQ ----------


def test_ivfpq_full_probe_matches_numpy_adc(spark):
    """n_probe == n_cells scans everything; distances must equal a
    numpy re-computation of the residual ADC pipeline from the
    collected index artifacts."""
    from zoom_spark.similarity.pq import ivfpq_build, ivfpq_topk

    rng = np.random.default_rng(7)
    x = rng.normal(size=(120, 8))
    df = _df(spark, x).repartition(3)
    encoded, cents, books = ivfpq_build(
        df, "v", "vec_id", n_cells=4, m=2, k=8, max_iter=3
    )
    cents_np, books_np = np.array(cents), np.array(books)
    codes = {r["id"]: (r["cell"], r["codes"]) for r in encoded.collect()}
    queries = [(int(i), x[i].tolist()) for i in (0, 50, 100)]
    out = ivfpq_topk(
        encoded, cents, books, queries, n_probe=4, k_neighbors=120
    ).collect()
    assert {r["query_id"] for r in out} == {0, 50, 100}
    m, _, ds = books_np.shape
    for r in out:
        q = x[r["query_id"]]
        cell, cs = codes[r["id"]]
        rq = (q - cents_np[cell]).reshape(m, ds)
        expect = sum(
            float(((rq[j] - books_np[j][cs[j]]) ** 2).sum()) for j in range(m)
        )
        assert abs(r["adc_dist"] - round(expect, 6)) < 1e-6


def test_ivfpq_recall_on_clustered_data(spark):
    from zoom_spark.similarity.pq import ivfpq_build, ivfpq_topk

    rng = np.random.default_rng(8)
    centers = rng.normal(size=(4, 16)) * 50.0
    pts = np.concatenate([c + rng.normal(size=(25, 16)) for c in centers])
    df = _df(spark, pts).repartition(4)
    encoded, cents, books = ivfpq_build(
        df, "v", "vec_id", n_cells=4, m=4, k=16, max_iter=4
    )
    queries = [(int(i), pts[i].tolist()) for i in (0, 30, 60, 90)]
    out = ivfpq_topk(encoded, cents, books, queries, n_probe=2, k_neighbors=10).collect()
    assert len(out) == 40
    for r in out:
        assert r["id"] // 25 == r["query_id"] // 25


def test_ivfpq_probe_subset_of_full(spark):
    """Probing fewer cells returns a subset of the full-probe
    candidate ids for each query (cells partition the corpus)."""
    from zoom_spark.similarity.pq import ivfpq_build, ivfpq_topk

    rng = np.random.default_rng(9)
    x = rng.normal(size=(80, 8))
    df = _df(spark, x)
    encoded, cents, books = ivfpq_build(
        df, "v", "vec_id", n_cells=4, m=2, k=8, max_iter=2
    )
    queries = [(0, x[0].tolist())]
    full = {
        r["id"]
        for r in ivfpq_topk(
            encoded, cents, books, queries, n_probe=4, k_neighbors=80
        ).collect()
    }
    part = {
        r["id"]
        for r in ivfpq_topk(
            encoded, cents, books, queries, n_probe=1, k_neighbors=80
        ).collect()
    }
    assert part < full

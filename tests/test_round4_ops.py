"""Property tests for the round-4 operators: SemDeDup, distributed
PCA, and exact threshold heavy hitters."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from zoom_spark.dedup.semdedup import semdedup
from zoom_spark.operators.heavy_hitters import (
    local_candidates,
    threshold_heavy_hitters,
)
from zoom_spark.similarity.pca import fit_pca, project


# ---------- SemDeDup ----------


def _unit(rng, dim):
    v = [rng.gauss(0, 1) for _ in range(dim)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def test_semdedup_drops_exact_duplicates_keeps_originals(spark):
    rng = random.Random(7)
    dim = 16
    base = [_unit(rng, dim) for _ in range(40)]
    rows = [(i, base[i]) for i in range(40)]
    # plant exact clones of vectors 0..9 at ids 100..109
    rows += [(100 + i, list(base[i])) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = semdedup(df, "v", "id", k=4, threshold=0.999).collect()
    by_id = {r["id"]: r for r in out}
    assert len(out) == 50
    # every clone is dropped (its original has the smaller id)
    for i in range(10):
        assert not by_id[100 + i]["keep"], f"clone {100+i} survived"
        assert by_id[i]["keep"], f"original {i} dropped"


def test_semdedup_keeps_orthogonal_set(spark):
    dim = 12
    rows = [(i, [1.0 if j == i else 0.0 for j in range(dim)]) for i in range(dim)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = semdedup(df, "v", "id", k=2, threshold=0.9).collect()
    assert all(r["keep"] for r in out)


def test_semdedup_reuses_supplied_centroids(spark):
    rows = [(i, [float(i), 1.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = semdedup(
        df, "v", "id", threshold=1.01, centroids=[[0.0, 1.0], [5.0, 1.0]]
    ).collect()
    # threshold > 1 => nothing droppable, but cells come from the
    # supplied centroids (no fit ran)
    assert all(r["keep"] for r in out)
    assert {r["cell"] for r in out} == {0, 1}


# ---------- PCA ----------


def test_pca_components_orthonormal_and_variance_ordered(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(300, 10)) * np.linspace(5, 0.1, 10)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)], "id long, v array<double>"
    )
    _, comps, evals = fit_pca(df, "v", n_components=4)
    w = np.array(comps)
    assert np.allclose(w @ w.T, np.eye(4), atol=1e-8)
    assert evals == sorted(evals, reverse=True)


def test_pca_recovers_planted_subspace_and_matches_numpy(spark):
    rng = np.random.default_rng(11)
    # rank-2 data in 8 dims + tiny noise
    basis = rng.normal(size=(2, 8))
    coef = rng.normal(size=(400, 2)) * [4.0, 2.0]
    x = coef @ basis + rng.normal(size=(400, 8)) * 1e-3
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)], "id long, v array<double>"
    ).repartition(7)
    mean, comps, evals = fit_pca(df, "v", n_components=2)
    # distributed moments == numpy covariance eigens (same math)
    ref_evals = np.linalg.eigvalsh(np.cov(x.T))[::-1][:2]
    assert np.allclose(evals, ref_evals, rtol=1e-6)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    # top-2 components span the planted basis: projecting the basis
    # onto the components loses almost nothing
    w = np.array(comps)
    for b in basis:
        b = b / np.linalg.norm(b)
        assert np.linalg.norm(w.T @ (w @ b)) > 0.999


def test_pca_projection_matches_numpy(spark):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(50, 6))
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)], "id long, v array<double>"
    )
    mean, comps, _ = fit_pca(df, "v", n_components=3)
    got = {
        r["id"]: r["proj"]
        for r in project(df, "v", mean, comps).select("id", "proj").collect()
    }
    expect = (x - np.array(mean)) @ np.array(comps).T
    for i in range(50):
        assert np.allclose(got[i], expect[i], atol=1e-9)


# ---------- heavy hitters ----------


def _values_df(spark, counts: dict[str, int], parts: int = 8):
    rows = [(v,) for v, c in counts.items() for _ in range(c)]
    random.Random(0).shuffle(rows)
    return spark.createDataFrame(rows, "t string").repartition(parts)


def test_heavy_hitters_exact_vs_groupby(spark):
    rng = random.Random(42)
    counts = {f"tail{i}": rng.randint(1, 3) for i in range(200)}
    counts.update({"alpha": 150, "beta": 90, "gamma": 40})
    df = _values_df(spark, counts)
    k = 20
    got = {
        r["t"]: r["freq"] for r in threshold_heavy_hitters(df, "t", k).collect()
    }
    n = sum(counts.values())
    expect = {v: c for v, c in counts.items() if c * k > n}
    assert got == expect


def test_local_candidates_superset_of_true_heavy(spark):
    counts = {f"x{i}": 2 for i in range(100)}
    counts["big"] = 120
    df = _values_df(spark, counts, parts=16)
    k = 10
    cand = {r["t"] for r in local_candidates(df, "t", k).collect()}
    n = sum(counts.values())
    true_heavy = {v for v, c in counts.items() if c * k > n}
    assert true_heavy <= cand


def test_heavy_hitters_empty_when_uniform(spark):
    counts = {f"u{i}": 5 for i in range(50)}
    df = _values_df(spark, counts)
    assert threshold_heavy_hitters(df, "t", 10).count() == 0


# ---------- edge cases ----------


def test_heavy_hitters_single_partition_and_singleton(spark):
    df = spark.createDataFrame([("only",)], "t string").coalesce(1)
    got = threshold_heavy_hitters(df, "t", 5).collect()
    assert [(r["t"], r["freq"]) for r in got] == [("only", 1)]


def test_heavy_hitters_all_rows_same_value(spark):
    df = spark.createDataFrame([("x",)] * 100, "t string").repartition(8)
    got = threshold_heavy_hitters(df, "t", 10).collect()
    assert [(r["t"], r["freq"]) for r in got] == [("x", 100)]


def test_pca_constant_input_zero_covariance(spark):
    rows = [(i, [2.0, 5.0, -1.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    mean, comps, evals = fit_pca(df, "v", n_components=2)
    assert np.allclose(mean, [2.0, 5.0, -1.0])
    assert np.allclose(evals, 0.0)
    # projection of identical rows is identical (and ~0)
    out = project(df, "v", mean, comps).select("proj").collect()
    for r in out:
        assert np.allclose(r["proj"], 0.0, atol=1e-12)


def test_semdedup_single_row(spark):
    df = spark.createDataFrame([(1, [1.0, 0.0])], "id long, v array<double>")
    out = semdedup(df, "v", "id", k=1, threshold=0.9).collect()
    assert len(out) == 1 and out[0]["keep"]


# ---------- Hypothesis: heavy hitters always exact ----------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        counts=st.dictionaries(
            st.text(alphabet="abcdefgh", min_size=1, max_size=3),
            st.integers(min_value=1, max_value=60),
            min_size=1,
            max_size=40,
        ),
        k=st.integers(min_value=2, max_value=30),
        parts=st.integers(min_value=1, max_value=12),
    )
    def test_heavy_hitters_exact_for_any_distribution(
        spark_session_holder, counts, k, parts
    ):
        spark = spark_session_holder
        df = _values_df(spark, counts, parts=parts)
        got = {
            r["t"]: r["freq"]
            for r in threshold_heavy_hitters(df, "t", k).collect()
        }
        n = sum(counts.values())
        expect = {v: c for v, c in counts.items() if c * k > n}
        assert got == expect

    import pytest as _pytest

    @_pytest.fixture(scope="session")
    def spark_session_holder(spark):
        return spark

except ImportError:  # pragma: no cover - hypothesis is in the container
    pass


def test_heavy_hitters_bigint_column(spark):
    """Schema is derived from the input column's type (ADVICE r4):
    a bigint key must round-trip exactly, not coerce through string."""
    rows = [(10_000_000_007,)] * 50 + [(i,) for i in range(40)]
    df = spark.createDataFrame(rows, "t long").repartition(4)
    got = {r["t"]: r["freq"] for r in threshold_heavy_hitters(df, "t", 4).collect()}
    assert got == {10_000_000_007: 50}
    assert all(isinstance(k, int) for k in got)

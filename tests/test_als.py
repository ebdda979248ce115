"""Referee for one-sweep ALS (R197): dense numpy recompute of the
identical half-sweeps (same md5 init, same normal equations) via
matrix algebra instead of distributed group-solves, plus the
alternating-minimization objective-decrease invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR
from zoom_spark.operators.als import ALS_K, ALS_LAMBDA, hash_unit

pytestmark = pytest.mark.usefixtures("spark")


def _ratings():
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    )
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    return (
        j.groupby(["o_custkey", "l_partkey"])["l_quantity"]
        .sum()
        .reset_index()
        .rename(columns={"o_custkey": "u", "l_partkey": "i", "l_quantity": "r"})
    )


def _numpy_sweep(rt: pd.DataFrame):
    items = sorted(rt["i"].unique())
    users = sorted(rt["u"].unique())
    V0 = {
        i: np.array([hash_unit("item", int(i), j) for j in range(ALS_K)])
        for i in items
    }
    U1 = {}
    for u, g in rt.groupby("u"):
        V = np.stack([V0[i] for i in g["i"]])
        r = g["r"].to_numpy(dtype=float)
        U1[u] = np.linalg.solve(
            V.T @ V + ALS_LAMBDA * np.eye(ALS_K), V.T @ r
        )
    V1 = {}
    for i, g in rt.groupby("i"):
        U = np.stack([U1[u] for u in g["u"]])
        r = g["r"].to_numpy(dtype=float)
        V1[i] = np.linalg.solve(
            U.T @ U + ALS_LAMBDA * np.eye(ALS_K), U.T @ r
        )

    def rmse(U, V):
        se = [
            (r - (0.0 if U is None else float(U[u] @ V[i]))) ** 2
            for u, i, r in zip(rt["u"], rt["i"], rt["r"])
        ]
        return float(np.sqrt(np.mean(se)))

    def objective(U, V):
        errs = sum(
            (r - float(U[u] @ V[i])) ** 2
            for u, i, r in zip(rt["u"], rt["i"], rt["r"])
        )
        reg = ALS_LAMBDA * (
            sum(float(x @ x) for x in U.values())
            + sum(float(x @ x) for x in V.values())
        )
        return errs + reg

    return (
        rmse(None, V0),
        rmse(U1, V0),
        rmse(U1, V1),
        objective(U1, V0),
        objective(U1, V1),
    )


def test_als_sweep_matches_numpy_referee(spark):
    from zoom_spark.queries.recsys import als_one_sweep_rmse

    got = {
        r["stage"]: r["rmse_q6"]
        for r in als_one_sweep_rmse(spark, SF_DIR).collect()
    }
    rt = _ratings()
    r0, r1, r2, obj1, obj2 = _numpy_sweep(rt)
    assert got["zero_baseline"] == pytest.approx(r0, rel=1e-6)
    assert got["user_sweep"] == pytest.approx(r1, rel=1e-6)
    assert got["item_sweep"] == pytest.approx(r2, rel=1e-6)
    # alternating minimization must not increase the regularized
    # objective, and each fit must beat the zero baseline
    assert obj2 <= obj1 + 1e-9
    assert r1 < r0 and r2 < r0

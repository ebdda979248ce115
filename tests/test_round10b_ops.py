"""Independent referees for the round-10 second-wave operators (R366+).

Each test recomputes the statistic from the raw parquet with
pandas/numpy using the ORIGINAL textbook formulation (not the SQL
decomposition), then compares against the registered query."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR
from zoom_spark.io import load_table


def test_cochrans_q_matches_textbook(spark):
    from zoom_spark.queries.round10b_ops import cochrans_q_yearly_activity

    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate"
    ).toPandas()
    c = load_table(spark, SF_DIR, "customer").select("c_custkey").toPandas()
    o["yr"] = o["o_orderdate"].dt.year
    y0 = int(o["yr"].min())
    # textbook: binary matrix X (subjects x k), Q = k(k-1) sum_j (C_j - Cbar)^2
    #           / sum_i R_i (k - R_i)
    x = np.zeros((len(c), 3), dtype=np.int64)
    idx = {ck: i for i, ck in enumerate(c["c_custkey"])}
    for j in range(3):
        active = o.loc[o["yr"] == y0 + j, "o_custkey"].unique()
        for ck in active:
            x[idx[ck], j] = 1
    k = 3
    col = x.sum(axis=0)
    row = x.sum(axis=1)
    q = (
        k * (k - 1) * ((col - col.mean()) ** 2).sum()
        / (row * (k - row)).sum()
    )
    [r] = cochrans_q_yearly_activity(spark, SF_DIR).collect()
    assert r["n_subjects"] == len(c)
    assert [r["c0"], r["c1"], r["c2"]] == col.tolist()
    assert abs(r["q_stat"] - q) < 1e-6
    assert abs(r["p_value"] - math.exp(-q / 2)) < 1e-6
    # the BIGINT ratio must reproduce the float statistic exactly
    assert abs(r["q_num"] / r["q_den"] - q) < 1e-9


def test_bowker_matches_textbook(spark):
    from zoom_spark.queries.round10b_ops import bowker_symmetry_priority

    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"
    ).toPandas()

    def bucket(p):
        if p in ("1-URGENT", "2-HIGH"):
            return 0
        if p == "3-MEDIUM":
            return 1
        return 2

    o["b"] = o["o_orderpriority"].map(bucket)
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    n = np.zeros((3, 3), dtype=np.int64)
    for _, g in o.groupby("o_custkey"):
        bs = g["b"].to_numpy()
        for a, b in zip(bs[:-1], bs[1:]):
            n[a, b] += 1
    chi2 = sum(
        (n[i, j] - n[j, i]) ** 2 / (n[i, j] + n[j, i])
        for i in range(3)
        for j in range(i + 1, 3)
        if n[i, j] + n[j, i] > 0
    )
    [r] = bowker_symmetry_priority(spark, SF_DIR).collect()
    assert r["n_transitions"] == int(n.sum())
    assert (r["n01"], r["n10"]) == (n[0, 1], n[1, 0])
    assert (r["n02"], r["n20"]) == (n[0, 2], n[2, 0])
    assert (r["n12"], r["n21"]) == (n[1, 2], n[2, 1])
    assert r["df"] == 3
    assert abs(r["chi2"] - chi2) < 1e-5  # 3 per-term 1e-9 floors


def test_cuzick_matches_textbook(spark):
    from zoom_spark.queries.round10b_ops import cuzick_trend_priority_price

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    lscore = o["o_orderpriority"].str[0].astype(int).to_numpy()
    cents = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype("int64")
    ranks = pd.Series(cents).rank(method="average").to_numpy()
    n = len(o)
    t_ = float((lscore * ranks).sum())
    el = (n + 1) * lscore.sum() / 2.0
    _, tie_counts = np.unique(cents, return_counts=True)
    tie3 = float(((tie_counts**3) - tie_counts).sum())
    var = (
        ((n + 1) / 12.0)
        * (n * (lscore**2).sum() - lscore.sum() ** 2)
        * (1 - tie3 / (n**3 - n))
    )
    z = (t_ - el) / math.sqrt(var)
    [r] = cuzick_trend_priority_price(spark, SF_DIR).collect()
    assert r["n"] == n
    assert r["t2"] == int(round(2 * t_))
    assert r["e2"] == int(round(2 * el))
    assert abs(r["z_stat"] - z) < 1e-6


def test_adf_matches_lstsq(spark):
    from zoom_spark.queries.round10b_ops import adf_unit_root_revenue

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype(
        "int64"
    )
    d = (
        o.groupby(o["o_orderdate"].dt.normalize())["cents"].sum() // 100
    ).sort_index()
    y = d.to_numpy(dtype=np.float64)
    dy = np.diff(y)
    # regression rows t = 3..T: dy_t on [1, y_{t-1}, dy_{t-1}]
    yv = dy[1:]
    x = np.column_stack([np.ones(len(yv)), y[1:-1], dy[:-1]])
    beta, *_ = np.linalg.lstsq(x, yv, rcond=None)
    resid = yv - x @ beta
    s2 = (resid**2).sum() / (len(yv) - 3)
    cov = s2 * np.linalg.inv(x.T @ x)
    t_rho = beta[1] / math.sqrt(cov[1, 1])
    [r] = adf_unit_root_revenue(spark, SF_DIR).collect()
    assert r["n_obs"] == len(yv)
    assert abs(r["rho"] - beta[1]) < 1e-5
    assert abs(r["phi"] - beta[2]) < 1e-5
    assert abs(r["const"] - beta[0]) < max(0.02, 1e-5 * abs(beta[0]))
    assert abs(r["adf_t"] - t_rho) < 1e-5
    # a unit-root regression on a mean-reverting daily total should
    # reject hard: rho must be negative (pulls back toward the mean)
    assert r["rho"] < 0

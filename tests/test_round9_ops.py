"""Referees for the round-9 operators (R327+): independent
numpy/pandas implementations over the same sf0.001 fixture — a
different code path from both the Spark plans and the DuckDB oracles
(which share only the definition, not the execution)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR

pytestmark = pytest.mark.usefixtures("spark")


def _events():
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _orders():
    return pd.read_parquet(f"{SF_DIR}/orders.parquet")


def _weekend_split():
    ev = _events()
    days = (
        pd.to_datetime(ev["ts"]).dt.normalize()
        - pd.Timestamp("2024-01-01")
    ).dt.days % 7
    wk = ev["value"][days.isin([5, 6])].to_numpy()
    wd = ev["value"][~days.isin([5, 6])].to_numpy()
    return wk, wd


def test_cliffs_delta_matches_bruteforce(spark):
    from zoom_spark.queries.round9_ops import cliffs_delta_weekend

    wk, wd = _weekend_split()
    # O(m*n) brute force on the tiny fixture
    gt = sum((a > wd).sum() for a in wk)
    lt = sum((a < wd).sum() for a in wk)
    want = (gt - lt) / (len(wk) * len(wd))
    row = cliffs_delta_weekend(spark, SF_DIR).collect()[0]
    assert row["n_weekend"] == len(wk)
    assert row["n_weekday"] == len(wd)
    assert abs(row["cliffs_delta"] - want) < 1e-6


def test_gk_gamma_matches_bruteforce(spark):
    from zoom_spark.queries.round9_ops import gk_gamma_priority_price

    o = _orders()
    x = o["o_orderpriority"].str[0].astype(int).to_numpy()
    y = np.floor(o["o_totalprice"].to_numpy() / 50000.0).astype(np.int64)
    conc = disc = 0
    n = len(x)
    for i in range(n):
        dx = x[i + 1 :] - x[i]
        dy = y[i + 1 :] - y[i]
        s = dx * dy
        conc += int((s > 0).sum())
        disc += int((s < 0).sum())
    row = gk_gamma_priority_price(spark, SF_DIR).collect()[0]
    assert row["concordant"] == conc
    assert row["discordant"] == disc
    assert abs(row["gamma"] - (conc - disc) / (conc + disc)) < 1e-6


def test_theils_u_matches_entropy_decomposition(spark):
    from zoom_spark.queries.round9_ops import theils_u_status_priority

    o = _orders()
    n = len(o)
    py = o["o_orderstatus"].value_counts() / n
    hy = -sum(p * math.log(p) for p in py)
    hyx = 0.0
    for _, grp in o.groupby("o_orderpriority"):
        px = len(grp) / n
        pyx = grp["o_orderstatus"].value_counts() / len(grp)
        hyx += px * -sum(p * math.log(p) for p in pyx)
    row = theils_u_status_priority(spark, SF_DIR).collect()[0]
    assert abs(row["h_status"] - hy) < 1e-5
    assert abs(row["h_status_given_priority"] - hyx) < 1e-5
    assert abs(row["theils_u"] - (hy - hyx) / hy) < 1e-4
    assert 0.0 <= row["theils_u"] <= 1.0

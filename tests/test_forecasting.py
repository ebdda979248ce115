"""Referees for the Holt linear-trend forecast (R192): planted-series
convergence properties and a statsmodels-formula hand recompute on the
actual fixture — independent of the engine's applyInPandas path.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_DIR
from zoom_spark.queries.forecasting import HOLT_H, holt_fit

pytestmark = pytest.mark.usefixtures("spark")


def test_holt_recovers_exact_linear_trend():
    """On a perfectly linear series y_t = a + b*t the recursion is
    exact: level == last observation and trend == slope (Holt with
    s1=y1, b1=y2-y1 reproduces a linear signal with zero error), so
    the forecast continues the line exactly."""
    a, b = 100.0, 2.5
    ys = [a + b * t for t in range(50)]
    level, trend = holt_fit(ys)
    assert level == pytest.approx(ys[-1], abs=1e-9)
    assert trend == pytest.approx(b, abs=1e-9)


def test_holt_level_tracks_step_change():
    """After a step change, the level must move toward the new plateau
    (smoothing works) and stay within the data range."""
    ys = [10.0] * 30 + [20.0] * 30
    level, trend = holt_fit(ys)
    assert 15.0 < level <= 21.0
    assert abs(trend) < 1.0


def test_holt_query_matches_direct_recompute(spark):
    """End-to-end referee: recompute the daily series with pandas and
    the recursion with holt_fit, then check every output row, incl.
    the linear-in-h forecast identity."""
    from zoom_spark.queries.forecasting import holt_linear_forecast_revenue

    rows = holt_linear_forecast_revenue(spark, SF_DIR).collect()
    assert len(rows) == HOLT_H
    orders = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    daily = (
        orders.groupby("o_orderdate")["o_totalprice"]
        .sum()
        .round(2)
        .sort_index()
    )
    s, b = holt_fit(daily.tolist())
    by_h = {r["h"]: r for r in rows}
    assert set(by_h) == set(range(1, HOLT_H + 1))
    for h, r in by_h.items():
        assert r["n_days"] == len(daily)
        assert r["level"] == pytest.approx(s, abs=1e-3)
        assert r["trend"] == pytest.approx(b, abs=1e-5)
        assert r["yhat"] == pytest.approx(s + h * b, abs=1e-3)


def test_durbin_watson_matches_numpy_referee(spark):
    """R205 referee: full-precision numpy OLS + DW recompute."""
    import numpy as np

    from zoom_spark.queries.forecasting import durbin_watson_revenue_trend

    got = durbin_watson_revenue_trend(spark, SF_DIR).collect()[0]
    orders = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    daily = (
        orders.groupby("o_orderdate")["o_totalprice"].sum().round(2).sort_index()
    )
    y = daily.to_numpy()
    t = np.arange(1, len(y) + 1, dtype=float)
    b, a = np.polyfit(t, y, 1)
    e = y - (a + b * t)
    dw = float(((e[1:] - e[:-1]) ** 2).sum() / (e * e).sum())
    assert got["n_days"] == len(y)
    assert got["slope"] == pytest.approx(b, rel=1e-4)
    assert got["intercept"] == pytest.approx(a, rel=1e-4)
    assert got["dw"] == pytest.approx(dw, abs=1e-4)
    assert got["rho_approx"] == pytest.approx(1 - dw / 2, abs=1e-4)
    assert 0.0 <= got["dw"] <= 4.0


def test_runs_test_matches_direct_referee(spark):
    """R204 referee: direct run counting over the ordered sequence."""
    import math

    from zoom_spark.queries.experimentation import (
        runs_test_purchase_sequence,
    )

    got = runs_test_purchase_sequence(spark, SF_DIR).collect()[0]
    ev = (
        pd.read_parquet(
            f"{SF_DIR}/events.parquet",
            columns=["ts", "event_id", "event_type"],
        )
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    x = (ev["event_type"] == "purchase").astype(int).to_numpy()
    n = len(x)
    n1 = int(x.sum())
    runs = 1 + int((x[1:] != x[:-1]).sum())
    mu = 1 + 2.0 * n1 * (n - n1) / n
    two_m = 2.0 * n1 * (n - n1)
    sig = math.sqrt(two_m * (two_m - n) / (float(n) * n * (n - 1)))
    z = (runs - mu) / sig
    assert got["n_obs"] == n and got["n_success"] == n1
    assert got["n_runs"] == runs
    assert got["z"] == pytest.approx(z, abs=1e-5)
    p = 2 * (1 - 0.5 * (1 + math.erf(abs(z) / math.sqrt(2))))
    assert got["p_value"] == pytest.approx(p, abs=1e-5)


def test_holt_winters_matches_independent_recursion(spark):
    """R231 referee: independently re-run the additive HW recursion
    (numpy array state, different code path from holt_winters_fit)
    and pin level/trend/season/yhat; also the identity
    yhat(h) = level + h*trend + season[(h-1) % m]."""
    import numpy as np

    from zoom_spark.queries.forecasting import (
        HW_A,
        HW_B,
        HW_G,
        HW_H,
        HW_M,
        holt_winters_forecast_revenue,
    )

    rows = sorted(
        holt_winters_forecast_revenue(spark, SF_DIR).collect(),
        key=lambda r: r["h"],
    )
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    ys = (
        o.groupby("o_orderdate")["o_totalprice"]
        .sum()
        .round(2)
        .sort_index()
        .to_numpy()
    )
    n = len(ys)
    base = ys[:HW_M].mean()
    s = base
    b = (ys[HW_M : 2 * HW_M].mean() - base) / HW_M
    ring = list(ys[:HW_M] - base)
    for t in range(HW_M, n):
        c = ring.pop(0)
        s_new = HW_A * (ys[t] - c) + (1 - HW_A) * (s + b)
        b = HW_B * (s_new - s) + (1 - HW_B) * b
        ring.append(HW_G * (ys[t] - s_new) + (1 - HW_G) * c)
        s = s_new
    assert len(rows) == HW_H
    for r in rows:
        h = r["h"]
        assert r["n_days"] == n
        assert r["level"] == pytest.approx(s, abs=1e-2)
        assert r["trend"] == pytest.approx(b, abs=1e-4)
        assert r["season"] == pytest.approx(
            ring[(h - 1) % HW_M], abs=1e-2
        )
        assert r["yhat"] == pytest.approx(
            round(r["level"] + h * r["trend"] + r["season"], 3), abs=2e-2
        )
    # seasonality is real on this fixture: offsets are not all equal
    seasons = [r["season"] for r in rows]
    assert max(seasons) - min(seasons) > 1.0

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

"""Referee for the Wald SPRT operator (R196): pandas cumulative
recompute of the LLR trajectory and first boundary crossing.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_DIR
from zoom_spark.queries.experimentation import (
    SPRT_C0,
    SPRT_C1,
    SPRT_LN_A,
    SPRT_LN_B,
)

pytestmark = pytest.mark.usefixtures("spark")


def _trajectory():
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["ts", "event_id", "event_type"]
    ).sort_values(["ts", "event_id"]).reset_index(drop=True)
    x = (ev["event_type"] == "purchase").astype(int)
    k1 = x.cumsum()
    n = pd.RangeIndex(1, len(ev) + 1)
    llr = k1.to_numpy() * SPRT_C1 + (n.to_numpy() - k1.to_numpy()) * SPRT_C0
    return llr


def test_sprt_matches_pandas_cumulative_referee(spark):
    from zoom_spark.queries.experimentation import sprt_purchase_rate

    got = sprt_purchase_rate(spark, SF_DIR).collect()[0]
    llr = _trajectory()
    n = len(llr)
    crossing = [
        i + 1
        for i, v in enumerate(llr)
        if v >= SPRT_LN_A or v <= SPRT_LN_B
    ]
    assert got["n_obs"] == n
    if crossing:
        dn = crossing[0]
        assert got["decision_n"] == dn
        expect = "accept_h1" if llr[dn - 1] >= SPRT_LN_A else "accept_h0"
        assert got["decision"] == expect
        assert got["llr_at_decision"] == pytest.approx(llr[dn - 1], abs=1e-5)
    else:
        assert got["decision_n"] is None
        assert got["decision"] == "continue"
        assert got["llr_at_decision"] is None
    assert got["llr_final"] == pytest.approx(llr[-1], abs=1e-5)


def test_sprt_boundaries_are_wald_5pct():
    import math

    assert SPRT_LN_A == pytest.approx(math.log(0.95 / 0.05))
    assert SPRT_LN_B == pytest.approx(-math.log(0.95 / 0.05))
    assert SPRT_C1 > 0 > SPRT_C0

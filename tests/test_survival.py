"""Referees for the survival extensions (R200-R201): explicit
per-user event-table recompute in pandas (risk sets built by direct
counting, not running sums), textbook log-rank terms, and the
Nelson-Aalen <-> Kaplan-Meier consistency inequality.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR

pytestmark = pytest.mark.usefixtures("spark")


def _spells():
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    ev["day"] = ev["ts"].dt.normalize()
    first = ev.groupby("user_id")["day"].min()
    conv = (
        ev[ev["event_type"] == "purchase"].groupby("user_id")["day"].min()
    )
    horizon = ev["day"].max()
    rows = []
    for u, fd in first.items():
        cd = conv.get(u)
        if cd is not None and cd >= fd:
            t, e = (cd - fd).days, 1
        else:
            t, e = (horizon - fd).days, 0
        grp = int(hashlib.md5(str(u).encode()).hexdigest()[0] < "8")
        rows.append((t, e, grp))
    return pd.DataFrame(rows, columns=["t", "e", "g"])


def test_logrank_matches_direct_risk_set_referee(spark):
    from zoom_spark.queries.survival import logrank_arm_conversion

    got = logrank_arm_conversion(spark, SF_DIR).collect()[0]
    sp = _spells()
    o1 = e1 = v = 0.0
    for t in sorted(sp.loc[sp["e"] == 1, "t"].unique()):
        at_risk = sp[sp["t"] >= t]
        n = len(at_risk)
        n1 = int((at_risk["g"] == 1).sum())
        ev_t = sp[(sp["t"] == t) & (sp["e"] == 1)]
        d = len(ev_t)
        d1 = int((ev_t["g"] == 1).sum())
        o1 += d1
        e1 += d * n1 / n
        if n > 1:
            v += d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
    z = (o1 - e1) / math.sqrt(v)
    assert got["observed_1"] == o1
    assert got["expected_1"] == pytest.approx(e1, abs=1e-3)
    assert got["z"] == pytest.approx(z, abs=1e-5)
    assert got["chi2"] == pytest.approx(z * z, abs=1e-4)
    p = 2 * (1 - 0.5 * (1 + math.erf(abs(z) / math.sqrt(2))))
    assert got["p_value"] == pytest.approx(p, abs=1e-5)


def test_nelson_aalen_matches_direct_referee_and_km_bound(spark):
    from zoom_spark.queries.survival import nelson_aalen_conversion

    rows = nelson_aalen_conversion(spark, SF_DIR).collect()
    sp = _spells()
    ch = 0.0
    vr = 0.0
    expect = {}
    for t in sorted(sp.loc[sp["e"] == 1, "t"].unique()):
        n = int((sp["t"] >= t).sum())
        d = int(((sp["t"] == t) & (sp["e"] == 1)).sum())
        ch += d / n
        vr += d / (n * n)
        expect[t] = (d, n, ch, math.sqrt(vr))
    got = {r["day"]: r for r in rows}
    assert set(got) == set(expect)
    for t, (d, n, ch_t, se_t) in expect.items():
        r = got[t]
        assert r["n_events"] == d and r["n_risk"] == n
        assert r["cum_hazard"] == pytest.approx(ch_t, abs=1e-5)
        assert r["se"] == pytest.approx(se_t, abs=1e-5)
    # exp(-H(t)) >= KM S(t) pointwise (standard inequality), strictly
    # monotone hazard
    hs = [got[t]["cum_hazard"] for t in sorted(got)]
    assert all(b >= a for a, b in zip(hs, hs[1:]))

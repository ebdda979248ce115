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


def test_jackknife_ratio_matches_explicit_loo_referee(spark):
    """R198 referee: explicit leave-one-out recompute (actually drop
    each customer and recompute the ratio) at full precision."""
    import numpy as np

    from zoom_spark.queries.experimentation import (
        jackknife_ratio_revenue_per_order,
    )

    got = jackknife_ratio_revenue_per_order(spark, SF_DIR).collect()[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    unit = o.groupby("o_custkey").agg(
        rev=("o_totalprice", "sum"), cnt=("o_totalprice", "count")
    )
    R, N = unit["rev"].sum(), unit["cnt"].sum()
    theta = R / N
    loo = (R - unit["rev"]) / (N - unit["cnt"])
    n = len(unit)
    se = float(np.sqrt((n - 1) / n * ((loo - loo.mean()) ** 2).sum()))
    assert got["n_units"] == n
    assert got["theta"] == pytest.approx(theta, rel=1e-9)
    assert got["se_jack"] == pytest.approx(se, rel=1e-5)
    assert got["ci_lo"] == pytest.approx(theta - 1.96 * se, rel=1e-5)
    assert got["ci_hi"] == pytest.approx(theta + 1.96 * se, rel=1e-5)
    # the CI must bracket theta
    assert got["ci_lo"] < got["theta"] < got["ci_hi"]


def test_bayes_ab_matches_lgamma_referee(spark):
    """R208 referee: math.lgamma closed-form recompute of
    P(p_B > p_A) — a completely different log-Beta path than the
    engine's distributed log-factorial table."""
    import hashlib
    import math

    from zoom_spark.queries.experimentation import bayes_ab_prob_purchase

    got = bayes_ab_prob_purchase(spark, SF_DIR).collect()[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_type"]
    )
    arm = ev["user_id"].map(
        lambda u: hashlib.md5(str(u).encode()).hexdigest()[0] < "8"
    )
    x = ev["event_type"] == "purchase"
    s_a, f_a = int((~arm & x).sum()), int((~arm & ~x).sum())
    s_b, f_b = int((arm & x).sum()), int((arm & ~x).sum())
    aa, ba, ab, bb = s_a + 1, f_a + 1, s_b + 1, f_b + 1

    def ln_beta(p, q):
        return math.lgamma(p) + math.lgamma(q) - math.lgamma(p + q)

    h = sum(
        math.exp(
            ln_beta(aa + i, ba + bb)
            - math.log(bb + i)
            - ln_beta(1 + i, bb)
            - ln_beta(aa, ba)
        )
        for i in range(ab)
    )
    assert (got["s_a"], got["f_a"], got["s_b"], got["f_b"]) == (
        s_a,
        f_a,
        s_b,
        f_b,
    )
    assert got["prob_b_beats_a"] == pytest.approx(h, abs=1e-5)
    assert 0.0 <= got["prob_b_beats_a"] <= 1.0
    lift = s_b / (s_b + f_b) - s_a / (s_a + f_a)
    assert got["rate_lift"] == pytest.approx(lift, abs=1e-6)
    # directional consistency: positive observed lift => prob > 0.5
    if abs(lift) > 1e-6:
        assert (got["prob_b_beats_a"] > 0.5) == (lift > 0)


def test_median_ci_matches_scipy_free_referee(spark):
    """R210 referee: exact binomial CDF via math.lgamma + direct
    order-statistic lookup on the sorted sample; also the coverage
    identity (the CI must bracket the sample median)."""
    import math

    from zoom_spark.queries.experimentation import (
        MEDCI_ALPHA,
        median_ci_order_stats,
    )

    got = median_ci_order_stats(spark, SF_DIR).collect()[0]
    prices = sorted(
        pd.read_parquet(
            f"{SF_DIR}/orders.parquet", columns=["o_totalprice"]
        )["o_totalprice"]
    )
    n = len(prices)

    def ln_choose(n_, k_):
        return (
            math.lgamma(n_ + 1)
            - math.lgamma(k_ + 1)
            - math.lgamma(n_ - k_ + 1)
        )

    cdf = []
    acc = 0.0
    for j in range(n + 1):
        acc += math.exp(ln_choose(n, j) - n * math.log(2.0))
        cdf.append(acc)
    lo_rank = max(j for j in range(n + 1) if cdf[j] <= MEDCI_ALPHA / 2) + 1
    hi_rank = min(j for j in range(n + 1) if cdf[j] >= 1 - MEDCI_ALPHA / 2) + 1
    assert got["n"] == n
    assert got["lo_rank"] == lo_rank
    assert got["hi_rank"] == hi_rank
    assert got["ci_lo"] == pytest.approx(prices[lo_rank - 1], abs=1e-9)
    assert got["ci_hi"] == pytest.approx(prices[hi_rank - 1], abs=1e-9)
    assert got["ci_lo"] <= got["median"] <= got["ci_hi"]
    # the interval must be properly inside the data range (n >> 40)
    assert lo_rank > 1 and hi_rank < n


def test_fisher_exact_matches_lgamma_referee(spark):
    """R215 referee: hypergeometric pmf via math.lgamma directly on
    the pandas-counted 2x2 table (scipy-free), both tails."""
    import math

    from zoom_spark.queries.experimentation import (
        _FISHER_TOL,
        fisher_exact_weekend_purchase,
    )

    [got] = fisher_exact_weekend_purchase(spark, SF_DIR).collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    days = (
        pd.to_datetime(ev["ts"]).dt.normalize()
        - pd.Timestamp("2024-01-01")
    ).dt.days
    wk = (days % 7).isin([5, 6]).to_numpy()
    x = (ev["event_type"] == "purchase").to_numpy()
    a = int((wk & x).sum())
    b = int((wk & ~x).sum())
    c = int((~wk & x).sum())
    d = int((~wk & ~x).sum())
    assert (
        got["weekend_purchases"],
        got["weekend_other"],
        got["weekday_purchases"],
        got["weekday_other"],
    ) == (a, b, c, d)
    r1, r2, c1, n = a + b, c + d, a + c, a + b + c + d

    def lnc(n_, k_):
        return (
            math.lgamma(n_ + 1)
            - math.lgamma(k_ + 1)
            - math.lgamma(n_ - k_ + 1)
        )

    lnp = {
        i: lnc(r1, i) + lnc(r2, c1 - i) - lnc(n, c1)
        for i in range(max(0, c1 - r2), min(r1, c1) + 1)
    }
    p_greater = sum(math.exp(v) for i, v in lnp.items() if i >= a)
    cutoff = lnp[a] + math.log(_FISHER_TOL)
    p_two = sum(math.exp(v) for v in lnp.values() if v <= cutoff)
    assert got["p_greater"] == pytest.approx(round(p_greater, 6), abs=2e-6)
    assert got["p_two_sided"] == pytest.approx(round(p_two, 6), abs=2e-6)
    assert got["odds_ratio"] == pytest.approx(
        round(a * d / (b * c), 6), abs=1e-9
    )
    # p-values are probabilities; two-sided >= one-sided tail here
    assert 0 <= got["p_greater"] <= 1 and 0 <= got["p_two_sided"] <= 1

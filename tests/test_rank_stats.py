"""Independent referees for the rank/classical statistics operators
(R186–R190): pandas.rank(method='average') + numpy recompute every
statistic at full precision — a different algorithm path than the
engine's distributed value-collapse + prefix-scan mid-ranks.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR

pytestmark = pytest.mark.usefixtures("spark")

EV = "/root/testdata/sf0.001/events.parquet"


def _weekend_frame() -> pd.DataFrame:
    df = pd.read_parquet(EV, columns=["ts", "value"])
    day = (df["ts"].dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    df["grp"] = (day % 7).isin([5, 6]).astype(int)
    return df


def test_mann_whitney_matches_pandas_rank_referee(spark):
    """R186 referee: pandas mid-ranks -> U, tie-corrected z, A-S p."""
    from zoom_spark.queries.rank_stats import mann_whitney_u_weekend

    got = mann_whitney_u_weekend(spark, SF_DIR).collect()[0]
    df = _weekend_frame()
    ranks = df["value"].rank(method="average")
    a = df["grp"] == 1
    n1, n2 = int(a.sum()), int((~a).sum())
    n = n1 + n2
    r1 = float(ranks[a].sum())
    u1 = r1 - n1 * (n1 + 1) / 2.0
    counts = df["value"].value_counts().to_numpy(dtype=float)
    tie = float((counts**3 - counts).sum())
    sigma = math.sqrt((n1 * n2 / 12.0) * ((n + 1) - tie / (n * (n - 1))))
    z = (u1 - n1 * n2 / 2.0) / sigma
    p = 2 * (1 - 0.5 * (1 + math.erf(abs(z) / math.sqrt(2))))
    assert got["n_weekend"] == n1 and got["n_weekday"] == n2
    assert got["u_stat"] == pytest.approx(u1, abs=0.11)
    assert got["z"] == pytest.approx(z, abs=1e-5)
    # A-S 7.1.26 polynomial is accurate to ~1.5e-7 vs true erf
    assert got["p_value"] == pytest.approx(p, abs=1e-5)


def test_kruskal_wallis_matches_pandas_rank_referee(spark):
    """R187 referee: pandas global mid-ranks + groupby rank sums."""
    from zoom_spark.queries.rank_stats import kruskal_wallis_segments

    got = kruskal_wallis_segments(spark, SF_DIR).collect()[0]
    orders = pd.read_parquet(
        "/root/testdata/sf0.001/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    cust = pd.read_parquet(
        "/root/testdata/sf0.001/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
    )
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    ranks = j["o_totalprice"].rank(method="average")
    n = len(j)
    s = 0.0
    for _, idx in j.groupby("c_mktsegment").groups.items():
        rg = float(ranks.loc[idx].sum())
        s += rg * rg / len(idx)
    h = 12.0 * s / (n * (n + 1)) - 3 * (n + 1)
    counts = j["o_totalprice"].value_counts().to_numpy(dtype=float)
    tie_div = 1 - float((counts**3 - counts).sum()) / (n**3 - n)
    h_c = h / tie_div
    assert got["k_groups"] == j["c_mktsegment"].nunique()
    assert got["n"] == n
    assert got["h_stat"] == pytest.approx(h, abs=1e-4)
    assert got["h_tie_corrected"] == pytest.approx(h_c, abs=1e-4)
    # exact chi-square(4) survival closed form
    p = math.exp(-h_c / 2) * (1 + h_c / 2)
    assert got["p_value"] == pytest.approx(p, abs=1e-6)


def test_anova_f_matches_numpy_referee(spark):
    """R188 referee: full-precision numpy SSB/SSW/F/eta-squared."""
    from zoom_spark.queries.rank_stats import anova_f_segments

    got = anova_f_segments(spark, SF_DIR).collect()[0]
    orders = pd.read_parquet(
        "/root/testdata/sf0.001/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    cust = pd.read_parquet(
        "/root/testdata/sf0.001/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
    )
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    groups = [g["o_totalprice"].to_numpy() for _, g in j.groupby("c_mktsegment")]
    k = len(groups)
    n = sum(len(g) for g in groups)
    gm = j["o_totalprice"].mean()
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got["k_groups"] == k and got["n"] == n
    # engine uses 6dp-rounded means / 2dp-rounded variances by design
    assert got["ssb_millions"] == pytest.approx(ssb / 1e6, rel=1e-6)
    assert got["ssw_millions"] == pytest.approx(ssw / 1e6, rel=1e-6)
    assert got["f_stat"] == pytest.approx(f, rel=1e-4)
    # engine output is 6dp-rounded: allow the rounding grid
    assert got["eta_squared"] == pytest.approx(ssb / (ssb + ssw), abs=1.1e-6)


def test_brown_forsythe_matches_numpy_referee(spark):
    """R189 referee: numpy median-centered Levene W (scipy formula)."""
    from zoom_spark.queries.rank_stats import levene_brown_forsythe

    got = levene_brown_forsythe(spark, SF_DIR).collect()[0]
    cust = pd.read_parquet(
        "/root/testdata/sf0.001/customer.parquet",
        columns=["c_mktsegment", "c_acctbal"],
    )
    zs = []
    for _, g in cust.groupby("c_mktsegment"):
        x = g["c_acctbal"].to_numpy()
        zs.append(np.abs(x - np.median(x)))
    k = len(zs)
    n = sum(len(z) for z in zs)
    allz = np.concatenate(zs)
    gm = allz.mean()
    ssb = sum(len(z) * (z.mean() - gm) ** 2 for z in zs)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
    w = (ssb / (k - 1)) / (ssw / (n - k))
    assert got["k_groups"] == k and got["n"] == n
    # engine rounds medians to 4dp / moments to 6dp|2dp by design
    assert got["w_stat"] == pytest.approx(w, rel=1e-3)


def test_effect_sizes_match_pandas_referee(spark):
    """R190 referee: pandas moments + rank-based U at full precision."""
    from zoom_spark.queries.rank_stats import effect_sizes_weekend

    got = effect_sizes_weekend(spark, SF_DIR).collect()[0]
    df = _weekend_frame()
    a = df.loc[df["grp"] == 1, "value"].to_numpy()
    b = df.loc[df["grp"] == 0, "value"].to_numpy()
    n1, n2 = len(a), len(b)
    pooled = math.sqrt(
        ((n1 - 1) * a.var(ddof=1) + (n2 - 1) * b.var(ddof=1)) / (n1 + n2 - 2)
    )
    d = (a.mean() - b.mean()) / pooled
    g = d * (1 - 3.0 / (4 * (n1 + n2) - 9))
    ranks = df["value"].rank(method="average")
    r1 = float(ranks[df["grp"] == 1].sum())
    u1 = r1 - n1 * (n1 + 1) / 2.0
    cles = u1 / (n1 * n2)
    assert got["n_weekend"] == n1 and got["n_weekday"] == n2
    assert got["cohens_d"] == pytest.approx(d, abs=1e-5)
    assert got["hedges_g"] == pytest.approx(g, abs=1e-5)
    assert got["cles"] == pytest.approx(cles, abs=1e-6)
    assert got["cliffs_delta"] == pytest.approx(2 * cles - 1, abs=1e-6)


def test_effect_sizes_sign_consistency(spark):
    """Planted invariant: Cliff's delta and Cohen's d need not share
    sign in general, but CLES in [0,1] and delta = 2*CLES-1 must hold
    exactly, and |delta| <= 1."""
    from zoom_spark.queries.rank_stats import effect_sizes_weekend

    got = effect_sizes_weekend(spark, SF_DIR).collect()[0]
    assert 0.0 <= got["cles"] <= 1.0
    assert abs(got["cliffs_delta"]) <= 1.0
    assert got["cliffs_delta"] == pytest.approx(2 * got["cles"] - 1, abs=2e-6)


def test_cochran_armitage_matches_direct_referee(spark):
    """R202 referee: direct per-weekday contingency recompute of the
    trend statistic at full precision."""
    from zoom_spark.queries.rank_stats import (
        cochran_armitage_weekday_trend,
    )

    got = cochran_armitage_weekday_trend(spark, SF_DIR).collect()[0]
    ev = pd.read_parquet(
        f"{SF_DIR.replace('sf0.001', 'sf0.001')}/events.parquet",
        columns=["ts", "event_type"],
    )
    day = (ev["ts"].dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    w = (day % 7).to_numpy()
    x = (ev["event_type"] == "purchase").to_numpy().astype(int)
    n = len(x)
    r = int(x.sum())
    pbar = r / n
    t_stat = sum(
        wi * (x[w == wi].sum() - (w == wi).sum() * pbar) for wi in range(7)
    )
    sw = sum(wi * (w == wi).sum() for wi in range(7))
    sw2 = sum(wi * wi * (w == wi).sum() for wi in range(7))
    var = pbar * (1 - pbar) * (sw2 - sw * sw / n)
    z = t_stat / math.sqrt(var)
    assert got["n_events"] == n and got["n_purchases"] == r
    assert got["z"] == pytest.approx(z, abs=1e-5)
    p = 2 * (1 - 0.5 * (1 + math.erf(abs(z) / math.sqrt(2))))
    assert got["p_value"] == pytest.approx(p, abs=1e-5)


def test_decision_stump_matches_exhaustive_referee(spark):
    """R206 referee: exhaustive O(V^2)-free python scan over all
    candidate thresholds with full-precision entropies."""
    from zoom_spark.queries.ml_primitives import decision_stump_acctbal

    got = decision_stump_acctbal(spark, SF_DIR).collect()[0]
    cust = pd.read_parquet(
        f"{SF_DIR.replace('0.001', '0.001')}/customer.parquet",
        columns=["c_custkey", "c_acctbal"],
    )
    orders = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )
    urgent = set(
        orders.loc[orders["o_orderpriority"] == "1-URGENT", "o_custkey"]
    )
    df = cust.assign(y=cust["c_custkey"].isin(urgent).astype(int)).sort_values(
        "c_acctbal"
    )

    def ent(p, n):
        if p <= 0 or p >= n:
            return 0.0
        f = p / n
        return -f * math.log(f) - (1 - f) * math.log(1 - f)

    n = len(df)
    p = int(df["y"].sum())
    parent = ent(p, n)
    best = None
    by_v = df.groupby("c_acctbal")["y"].agg(["count", "sum"])
    nl = pl = 0
    for v, row in by_v.iterrows():
        nl += int(row["count"])
        pl += int(row["sum"])
        if nl >= n:
            continue
        nr, pr = n - nl, p - pl
        g = parent - (nl / n) * ent(pl, nl) - (nr / n) * ent(pr, nr)
        if best is None or g > best[1] + 1e-12:
            best = (v, g, nl, nr)
    v, g, nl, nr = best
    assert got["threshold"] == pytest.approx(v, abs=1e-9)
    assert got["n_left"] == nl and got["n_right"] == nr
    assert got["info_gain"] == pytest.approx(g, abs=1e-5)
    assert got["info_gain"] >= 0.0

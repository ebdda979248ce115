"""Independent referees for the round-10 third-wave operators (R412+).

Each test recomputes the statistic from the raw parquet with
pandas/numpy using the ORIGINAL textbook formulation (not the SQL
decomposition), then compares against the registered query."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR
from zoom_spark.io import load_table


def _phi(z: float) -> float:
    return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))


def _daily_revenue(spark) -> pd.DataFrame:
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    o["day"] = o["o_orderdate"].dt.date
    o["cents"] = np.floor(o["o_totalprice"] * 100 + 0.5).astype(np.int64)
    d = o.groupby("day", as_index=False)["cents"].sum()
    d["y"] = (d["cents"] // 100).astype(np.int64)
    epoch = pd.Timestamp("1990-01-01").date()
    d["dow"] = d["day"].map(lambda x: (x - epoch).days % 7)
    return d.sort_values("day").reset_index(drop=True)


def test_seasonal_mann_kendall_matches_textbook(spark):
    from zoom_spark.queries.round10c_ops import (
        seasonal_mann_kendall_revenue,
    )

    d = _daily_revenue(spark)
    s_total = 0
    var_total = 0.0
    for dow in range(7):
        y = d.loc[d["dow"] == dow].sort_values("day")["y"].to_numpy()
        n = len(y)
        for i in range(n):
            s_total += int(np.sign(y[i + 1 :] - y[i]).sum())
        _, counts = np.unique(y, return_counts=True)
        tie = sum(t * (t - 1) * (2 * t + 5) for t in counts)
        var_total += (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    z = (s_total - np.sign(s_total)) / math.sqrt(var_total)
    [r] = seasonal_mann_kendall_revenue(spark, SF_DIR).collect()
    assert r["n_days"] == len(d)
    assert r["s_total"] == s_total
    assert r["var18"] == round(var_total * 18)
    assert abs(r["z_stat"] - z) < 1e-5
    assert abs(r["p_value"] - 2 * (1 - _phi(abs(z)))) < 1e-4


def _contingency(spark) -> pd.DataFrame:
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderpriority"
    ).toPandas()
    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment"
    ).toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    return pd.crosstab(j["o_orderpriority"], j["c_mktsegment"])


def test_g_test_matches_textbook(spark):
    from zoom_spark.queries.round10c_ops import g_test_priority_segment

    tab = _contingency(spark).to_numpy().astype(float)
    n = tab.sum()
    e = tab.sum(axis=1, keepdims=True) @ tab.sum(axis=0, keepdims=True) / n
    g = 2.0 * (tab * np.log(tab / e)).sum()
    chi2 = ((tab - e) ** 2 / e).sum()
    [r] = g_test_priority_segment(spark, SF_DIR).collect()
    assert r["n_orders"] == int(n)
    assert r["n_cells"] == tab.size
    assert r["df"] == 16
    assert abs(r["g_stat"] - g) < 1e-5
    assert abs(r["chi2_stat"] - chi2) < 1e-5


def test_gk_lambda_matches_textbook(spark):
    from zoom_spark.queries.round10c_ops import gk_lambda_priority_segment

    tab = _contingency(spark).to_numpy().astype(np.int64)
    n = tab.sum()
    sum_rowmax = tab.max(axis=1).sum()
    sum_colmax = tab.max(axis=0).sum()
    max_rtot = tab.sum(axis=1).max()
    max_ctot = tab.sum(axis=0).max()
    [r] = gk_lambda_priority_segment(spark, SF_DIR).collect()
    assert r["sum_rowmax"] == sum_rowmax
    assert r["sum_colmax"] == sum_colmax
    assert abs(
        r["lambda_seg_given_pri"]
        - (sum_rowmax - max_ctot) / (n - max_ctot)
    ) < 1e-6
    assert abs(
        r["lambda_pri_given_seg"]
        - (sum_colmax - max_rtot) / (n - max_rtot)
    ) < 1e-6
    assert abs(
        r["lambda_symmetric"]
        - (sum_rowmax + sum_colmax - max_ctot - max_rtot)
        / (2 * n - max_ctot - max_rtot)
    ) < 1e-6
    assert 0.0 <= r["lambda_symmetric"] <= 1.0


def test_uncertainty_coefficient_matches_textbook(spark):
    from zoom_spark.queries.round10c_ops import (
        uncertainty_coefficient_panel,
    )

    tab = _contingency(spark).to_numpy().astype(float)
    n = tab.sum()

    def ent(p):
        p = p[p > 0] / n
        return float(-(p * np.log(p)).sum())

    hx = ent(tab.sum(axis=1))
    hy = ent(tab.sum(axis=0))
    hxy = ent(tab.ravel())
    mi = hx + hy - hxy
    [r] = uncertainty_coefficient_panel(spark, SF_DIR).collect()
    assert r["n_orders"] == int(n)
    assert abs(r["h_pri"] - hx) < 1e-6
    assert abs(r["h_seg"] - hy) < 1e-6
    assert abs(r["h_joint"] - hxy) < 1e-6
    assert abs(r["mutual_info"] - mi) < 1e-5
    assert abs(r["u_seg_given_pri"] - mi / hy) < 1e-5
    assert abs(r["u_pri_given_seg"] - mi / hx) < 1e-5
    assert abs(r["u_symmetric"] - 2 * mi / (hx + hy)) < 1e-5
    # G-test identity: G = 2 N * MI (both in nats)
    g = 2.0 * n * mi
    e = tab.sum(axis=1, keepdims=True) @ tab.sum(axis=0, keepdims=True) / n
    g_direct = 2.0 * (tab * np.log(tab / e)).sum()
    assert abs(g - g_direct) < 1e-4


def _effects_panel(spark):
    """Textbook per-nation weekend-effect panel (theta, v) from raw rows."""
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).toPandas()
    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["x"] = (
        np.floor(j["o_totalprice"] * 100 + 0.5).astype(np.int64) // 100
    ).astype(np.int64)
    epoch = pd.Timestamp("1990-01-01")
    j["wk"] = (
        (j["o_orderdate"].dt.normalize() - epoch).dt.days % 7
    ).isin([5, 6])
    out = []
    for nation, g in j.groupby("c_nationkey"):
        we = g.loc[g["wk"], "x"].to_numpy(dtype=float)
        wd = g.loc[~g["wk"], "x"].to_numpy(dtype=float)
        if len(we) < 2 or len(wd) < 2:
            continue
        theta = we.mean() - wd.mean()
        v = we.var(ddof=1) / len(we) + wd.var(ddof=1) / len(wd)
        out.append((nation, theta, v))
    return out


def test_combined_pvalues_matches_textbook(spark):
    from zoom_spark.queries.round10c_ops import combined_pvalues_nations

    panel = _effects_panel(spark)
    zs = [t / math.sqrt(v) for _, t, v in panel]
    ps = [max(2 * (1 - _phi(abs(z))), 1e-12) for z in zs]
    fisher = -2 * sum(math.log(p) for p in ps)
    stouffer = sum(zs) / math.sqrt(len(zs))
    [r] = combined_pvalues_nations(spark, SF_DIR).collect()
    assert r["k"] == len(panel)
    assert r["fisher_df"] == 2 * len(panel)
    assert abs(r["fisher_stat"] - fisher) < 1e-3
    assert abs(r["stouffer_z"] - stouffer) < 1e-5
    assert abs(r["stouffer_p"] - 2 * (1 - _phi(abs(stouffer)))) < 1e-4


def test_meta_analysis_matches_textbook(spark):
    from zoom_spark.queries.round10c_ops import meta_analysis_weekend_effect

    panel = _effects_panel(spark)
    th = np.array([t for _, t, v in panel])
    v = np.array([vv for _, t, vv in panel])
    w = 1.0 / v
    k = len(panel)
    theta_f = (w * th).sum() / w.sum()
    q = (w * (th - theta_f) ** 2).sum()
    c = w.sum() - (w**2).sum() / w.sum()
    tau2 = max(0.0, (q - (k - 1)) / c)
    ws = 1.0 / (v + tau2)
    theta_r = (ws * th).sum() / ws.sum()
    [r] = meta_analysis_weekend_effect(spark, SF_DIR).collect()
    assert r["k"] == k
    assert abs(r["theta_fixed"] - theta_f) < 1e-2
    assert abs(r["q_stat"] - q) < 1e-3
    assert abs(r["tau2"] - tau2) < max(1e-6 * abs(tau2), 1.0)
    assert abs(r["theta_random"] - theta_r) < 1e-2
    assert abs(r["i_squared"] - max(0.0, (q - (k - 1)) / q)) < 1e-4
    assert abs(r["se_fixed"] - 1.0 / math.sqrt(w.sum())) < 1e-3
    assert abs(r["se_random"] - 1.0 / math.sqrt(ws.sum())) < 1e-3
    # random-effects SE must dominate fixed-effects SE
    assert r["se_random"] >= r["se_fixed"] - 1e-9


def test_egger_matches_lstsq(spark):
    from zoom_spark.queries.round10c_ops import egger_regression_asymmetry

    panel = _effects_panel(spark)
    se = np.array([math.sqrt(v) for _, t, v in panel])
    y = np.array([t for _, t, v in panel]) / se
    x = 1000.0 / se  # kilodollar precision grid (query spelling)
    k = len(panel)
    a = np.column_stack([np.ones(k), x])
    (b0, b1), *_ = np.linalg.lstsq(a, y, rcond=None)
    resid = y - a @ np.array([b0, b1])
    s2 = (resid**2).sum() / (k - 2)
    sxx = (x**2).sum()
    det = k * sxx - x.sum() ** 2
    se_b0 = math.sqrt(s2 * sxx / det)
    [r] = egger_regression_asymmetry(spark, SF_DIR).collect()
    assert r["k"] == k
    assert abs(r["egger_intercept"] - b0) < 1e-4
    assert abs(r["egger_slope"] - b1) < 1e-3
    assert abs(r["se_intercept"] - se_b0) < 1e-4
    assert abs(r["t_stat"] - b0 / se_b0) < 1e-3


def test_harrell_c_matches_bruteforce(spark):
    from zoom_spark.queries.round10c_ops import harrell_c_conversion

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_type"
    ).toPandas()
    ev["day"] = ev["ts"].dt.normalize()
    g = ev.groupby("user_id")
    first = g["day"].min()
    conv = ev.loc[ev["event_type"] == "purchase"].groupby("user_id")[
        "day"
    ].min()
    risk = g.size()
    horizon = ev["day"].max()
    rows = []
    for uid in first.index:
        cd = conv.get(uid, pd.NaT)
        if pd.notna(cd) and cd >= first[uid]:
            rows.append((uid, (cd - first[uid]).days, 1, risk[uid]))
        else:
            rows.append((uid, (horizon - first[uid]).days, 0, risk[uid]))
    df = pd.DataFrame(rows, columns=["uid", "t", "d", "risk"])
    # deterministic 16-bucket quantization (row_number over (risk, uid))
    df = df.sort_values(["risk", "uid"]).reset_index(drop=True)
    n = len(df)
    df["b"] = (df.index * 16) // n
    # brute-force usable/concordant over the bucketed risk
    usable = 0
    conc2 = 0
    arr = df[["t", "d", "b"]].to_numpy()
    for i in range(n):
        ti, di, bi = arr[i]
        if di != 1:
            continue
        later = arr[arr[:, 0] > ti]
        usable += len(later)
        conc2 += 2 * int((bi > later[:, 2]).sum()) + int(
            (bi == later[:, 2]).sum()
        )
    [r] = harrell_c_conversion(spark, SF_DIR).collect()
    assert r["n_users"] == n
    assert r["n_usable_pairs"] == usable
    assert r["concordant2"] == conc2
    assert abs(r["c_index"] - conc2 / (2 * usable)) < 1e-6


def test_croston_matches_recursion(spark):
    from zoom_spark.queries.round10c_ops import croston_intermittent_demand

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    ).toPandas()
    pt = load_table(spark, SF_DIR, "part").select(
        "p_partkey", "p_brand"
    ).toPandas()
    bb = pt["p_brand"].min()
    keys = set(pt.loc[pt["p_brand"] == bb, "p_partkey"])
    sub = li[li["l_partkey"].isin(keys)].copy()
    sub["day"] = sub["l_shipdate"].dt.normalize()
    sub["q"] = np.floor(sub["l_quantity"] + 0.5).astype(np.int64)
    dem = sub.groupby("day", as_index=False)["q"].sum().sort_values("day")
    z = dem["q"].to_numpy(dtype=float)
    days = dem["day"].to_numpy()
    gaps = np.diff(days).astype("timedelta64[D]").astype(float)
    # textbook SES recursion, alpha = 1/2, full history (no truncation)
    def ses(x):
        s = x[0]
        for v in x[1:]:
            s = 0.5 * v + 0.5 * s
        return s

    zh, ih = ses(z), ses(gaps)
    [r] = croston_intermittent_demand(spark, SF_DIR).collect()
    assert r["n_demands"] == len(z)
    assert abs(r["z_hat"] - zh) < 1e-4
    assert abs(r["i_hat"] - ih) < 1e-4
    assert abs(r["croston_forecast"] - zh / ih) < 1e-4
    assert abs(r["sba_forecast"] - 0.75 * zh / ih) < 1e-4


def test_vargha_delaney_matches_bruteforce(spark):
    from zoom_spark.queries.round10c_ops import vargha_delaney_a_weekend

    d = _daily_revenue(spark)
    we = d.loc[d["dow"].isin([5, 6]), "y"].to_numpy()
    wd = d.loc[~d["dow"].isin([5, 6]), "y"].to_numpy()
    gt = sum(int((w > wd).sum()) for w in we)
    eq = sum(int((w == wd).sum()) for w in we)
    a = (gt + 0.5 * eq) / (len(we) * len(wd))
    [r] = vargha_delaney_a_weekend(spark, SF_DIR).collect()
    assert r["n_weekend"] == len(we)
    assert r["n_weekday"] == len(wd)
    assert abs(r["a_measure"] - a) < 1e-6
    assert abs(r["cliffs_delta"] - (2 * a - 1)) < 1e-6


def test_hampel_filter_matches_pandas(spark):
    from zoom_spark.queries.round10c_ops import hampel_filter_revenue

    d = _daily_revenue(spark)
    y = d["y"].to_numpy()
    flagged = []
    for i in range(3, len(y) - 3):
        wnd = y[i - 3 : i + 4]
        med = int(np.sort(wnd)[3])
        mad = int(np.sort(np.abs(wnd - med))[3])
        dev = abs(int(y[i]) - med)
        if dev * 10000 > 44478 * mad:
            flagged.append((d["day"].iloc[i], int(y[i]), med, mad, dev))
    rows = hampel_filter_revenue(spark, SF_DIR).collect()
    assert len(rows) == len(flagged)
    for r, (day, yy, med, mad, dev) in zip(rows, flagged):
        assert r["day"] == day
        assert r["y"] == yy
        assert r["med7"] == med
        assert r["mad7"] == mad
        assert r["abs_dev"] == dev


def _probit_bisect(p: float) -> float:
    """Independent inverse-normal via bisection on math.erf."""
    lo, hi = -10.0, 10.0
    for _ in range(80):
        mid = (lo + hi) / 2
        if _phi(mid) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def test_ppcc_matches_independent_probit(spark):
    from zoom_spark.queries.round10c_ops import ppcc_normality_revenue

    d = _daily_revenue(spark)
    y = np.sort(d["y"].to_numpy().astype(float))
    n = len(y)
    q = np.array(
        [_probit_bisect((i + 1 - 0.375) / (n + 0.25)) for i in range(n)]
    )
    r = np.corrcoef(y, q)[0, 1]
    [row] = ppcc_normality_revenue(spark, SF_DIR).collect()
    assert row["n_days"] == n
    assert abs(row["ppcc"] - r) < 1e-5
    assert abs(row["w_prime"] - r * r) < 1e-5
    assert 0.0 < row["ppcc"] <= 1.0


def test_variance_ratio_panel_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import (
        variance_ratio_panel_priorities,
    )

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    o["x"] = (
        np.floor(o["o_totalprice"] * 100 + 0.5).astype(np.int64) // 100
    ).astype(np.int64)
    groups = {
        pri: g["x"].to_numpy(dtype=float)
        for pri, g in o.groupby("o_orderpriority")
    }
    s2 = {pri: v.var(ddof=1) for pri, v in groups.items()}
    vmax, vmin = max(s2.values()), min(s2.values())
    [r] = variance_ratio_panel_priorities(spark, SF_DIR).collect()
    assert r["k_groups"] == len(groups)
    assert r["max_priority"] == max(s2, key=lambda k: (s2[k], k))
    assert r["min_priority"] == min(s2, key=lambda k: (s2[k], k))
    assert abs(r["hartley_fmax"] - vmax / vmin) < 1e-5
    assert abs(r["cochran_c"] - vmax / sum(s2.values())) < 1e-5
    assert 1.0 / len(groups) <= r["cochran_c"] <= 1.0
    assert r["hartley_fmax"] >= 1.0


def test_sequential_patterns_match_pandas(spark):
    from zoom_spark.queries.round10c_ops import sequential_pattern_pairs

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts"
    ).toPandas()
    firsts = ev.groupby(["user_id", "event_type"], as_index=False)[
        "ts"
    ].min()
    support = {}
    for _, g in firsts.groupby("user_id"):
        recs = list(g[["event_type", "ts"]].itertuples(index=False))
        for a, ta in recs:
            for b, tb in recs:
                if a != b and ta < tb:
                    support[(a, b)] = support.get((a, b), 0) + 1
    n_ante = firsts.groupby("event_type").size().to_dict()
    expected = sorted(
        ((v, a, b) for (a, b), v in support.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    rows = sequential_pattern_pairs(spark, SF_DIR).collect()
    assert len(rows) == len(expected)
    for r, (sup, a, b) in zip(rows, expected):
        assert (r["antecedent"], r["consequent"], r["support"]) == (a, b, sup)
        assert r["n_antecedent"] == n_ante[a]
        assert abs(r["confidence"] - sup / n_ante[a]) < 1e-6


def _md5_int(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_countmin_matches_python_and_dominates(spark):
    from zoom_spark.queries.round10c_ops import countmin_sketch_users

    ev = load_table(spark, SF_DIR, "events").select("user_id").toPandas()
    counts = ev.groupby("user_id").size().to_dict()
    cells = {}
    for uid, c in counts.items():
        for r in range(4):
            b = _md5_int(f"{r}:{uid}") % 256
            cells[(r, b)] = cells.get((r, b), 0) + c
    rows = countmin_sketch_users(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        uid = r["user_id"]
        est = min(
            cells[(rr, _md5_int(f"{rr}:{uid}") % 256)] for rr in range(4)
        )
        assert r["exact_cnt"] == counts[uid]
        assert r["cms_est"] == est
        assert r["overestimate"] == est - counts[uid]
        # CMS never underestimates
        assert r["cms_est"] >= r["exact_cnt"]


def test_ams_f2_matches_python(spark):
    from zoom_spark.queries.round10c_ops import ams_f2_sketch_users

    ev = load_table(spark, SF_DIR, "events").select("user_id").toPandas()
    counts = ev.groupby("user_id").size().to_dict()
    f2 = sum(c * c for c in counts.values())
    sums = []
    for i in range(16):
        s = sum(
            c * (1 if _md5_int(f"{i}#{uid}") % 2 == 0 else -1)
            for uid, c in counts.items()
        )
        sums.append(s * s)
    grp = sorted(sum(sums[g * 4 : g * 4 + 4]) for g in range(4))
    est = (grp[1] + grp[2]) / 8.0
    [r] = ams_f2_sketch_users(spark, SF_DIR).collect()
    assert r["n_users"] == len(counts)
    assert r["exact_f2"] == f2
    assert abs(r["ams_estimate"] - est) < 0.01
    assert abs(r["relative_error"] - (est - f2) / f2) < 1e-6


def _baskets(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).toPandas().drop_duplicates()
    return li


def test_four_cycle_count_matches_bruteforce(spark):
    from itertools import combinations

    from zoom_spark.queries.round10c_ops import four_cycle_count_copurchase

    li = _baskets(spark)
    support = {}
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(g["l_partkey"])
        for u, v in combinations(ps, 2):
            support[(u, v)] = support.get((u, v), 0) + 1
    edges = {p for p, c in support.items() if c >= 2}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nodes = sorted(adj)
    quad = 0
    pairs_cn2 = 0
    for i, x in enumerate(nodes):
        for y in nodes[i + 1 :]:
            cn = len(adj[x] & adj[y])
            if cn >= 2:
                pairs_cn2 += 1
                quad += cn * (cn - 1) // 2
    [r] = four_cycle_count_copurchase(spark, SF_DIR).collect()
    assert r["n_edges"] == len(edges)
    assert r["n_pairs_cn2"] == pairs_cn2
    assert r["quad"] == quad
    assert quad % 2 == 0
    assert r["n_four_cycles"] == quad // 2


def test_hotelling_t2_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import hotelling_t2_weekend

    d = _daily_revenue(spark)
    o = load_table(spark, SF_DIR, "orders").select("o_orderdate").toPandas()
    o["day"] = o["o_orderdate"].dt.date
    cnt = o.groupby("day").size()
    d = d.set_index("day")
    x = np.column_stack([cnt.reindex(d.index).to_numpy(), d["y"].to_numpy()])
    wk = d["dow"].isin([5, 6]).to_numpy()
    g1, g0 = x[wk].astype(float), x[~wk].astype(float)
    n1, n0 = len(g1), len(g0)
    diff = g1.mean(axis=0) - g0.mean(axis=0)
    sp = ((n1 - 1) * np.cov(g1.T) + (n0 - 1) * np.cov(g0.T)) / (
        n1 + n0 - 2
    )
    t2 = (n1 * n0 / (n1 + n0)) * diff @ np.linalg.inv(sp) @ diff
    f = t2 * (n1 + n0 - 3) / ((n1 + n0 - 2) * 2)
    [r] = hotelling_t2_weekend(spark, SF_DIR).collect()
    assert r["n_weekend"] == n1
    assert r["n_weekday"] == n0
    assert abs(r["t2_stat"] - t2) < 1e-4
    assert abs(r["f_stat"] - f) < 1e-4


def _customer_frame(spark):
    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    ).toPandas()
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    o["dollars"] = (
        np.floor(o["o_totalprice"] * 100 + 0.5).astype(np.int64) // 100
    )
    agg = o.groupby("o_custkey").agg(
        n_orders=("dollars", "size"),
        spend=("dollars", "sum"),
        maxv=("dollars", "max"),
    )
    j = c.merge(agg, left_on="c_custkey", right_index=True, how="left")
    j[["n_orders", "spend", "maxv"]] = (
        j[["n_orders", "spend", "maxv"]].fillna(0).astype(np.int64)
    )
    return j


def test_wilks_lambda_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import wilks_lambda_manova

    j = _customer_frame(spark)
    x = j[["n_orders", "spend"]].to_numpy(dtype=float)
    labels = j["c_mktsegment"].to_numpy()
    grand = x.mean(axis=0)
    w = np.zeros((2, 2))
    for s in np.unique(labels):
        g = x[labels == s]
        dev = g - g.mean(axis=0)
        w += dev.T @ dev
    devt = x - grand
    t = devt.T @ devt
    lam = np.linalg.det(w) / np.linalg.det(t)
    n, k, p = len(x), len(np.unique(labels)), 2
    chi2 = -(n - 1 - (p + k) / 2) * math.log(lam)
    h = chi2 / 2
    pval = math.exp(-h) * (1 + h + h * h / 2 + h**3 / 6)
    [r] = wilks_lambda_manova(spark, SF_DIR).collect()
    assert r["k_groups"] == k
    assert r["n_customers"] == n
    assert abs(r["wilks_lambda"] - lam) < 1e-5
    assert abs(r["bartlett_chi2"] - chi2) < 1e-2
    assert r["df"] == p * (k - 1)
    assert abs(r["p_value"] - pval) < 1e-5


def test_canonical_correlation_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import (
        canonical_correlation_customers,
    )

    j = _customer_frame(spark)
    j["bal_cents"] = np.floor(j["c_acctbal"] * 100 + 0.5).astype(np.int64)
    x = j[["bal_cents", "n_orders"]].to_numpy(dtype=float)
    y = j[["spend", "maxv"]].to_numpy(dtype=float)
    xc = x - x.mean(axis=0)
    yc = y - y.mean(axis=0)
    sxx = xc.T @ xc
    syy = yc.T @ yc
    sxy = xc.T @ yc
    m = np.linalg.inv(sxx) @ sxy @ np.linalg.inv(syy) @ sxy.T
    ev = np.sort(np.linalg.eigvals(m).real)[::-1]
    [r] = canonical_correlation_customers(spark, SF_DIR).collect()
    assert r["n_customers"] == len(j)
    assert abs(r["rho1"] - math.sqrt(ev[0])) < 1e-5
    assert abs(r["rho2"] - math.sqrt(max(ev[1], 0))) < 1e-5
    assert 0 <= r["rho2"] <= r["rho1"] <= 1.0


def test_covisitation_matches_pandas(spark):
    from itertools import combinations

    from zoom_spark.queries.round10c_ops import covisitation_item_item_topk

    li = _baskets(spark)
    deg = li.groupby("l_partkey").size().to_dict()
    cnt = {}
    for _, g in li.groupby("l_orderkey"):
        for u, v in combinations(sorted(g["l_partkey"]), 2):
            cnt[(u, v)] = cnt.get((u, v), 0) + 1
    cand = [
        (c * c / (deg[a] * deg[b]), a, b, c)
        for (a, b), c in cnt.items()
        if c >= 2
    ]
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    rows = covisitation_item_item_topk(spark, SF_DIR).collect()
    assert len(rows) == min(20, len(cand))
    for r, (_, a, b, c) in zip(rows, cand[:20]):
        assert (r["item_a"], r["item_b"], r["co_count"]) == (a, b, c)
        assert r["deg_a"] == deg[a] and r["deg_b"] == deg[b]
        assert abs(r["cosine"] - c / math.sqrt(deg[a] * deg[b])) < 1e-6


def test_qte_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import quantile_treatment_effects

    d = _daily_revenue(spark)
    we = np.sort(d.loc[d["dow"].isin([5, 6]), "y"].to_numpy(float))
    wd = np.sort(d.loc[~d["dow"].isin([5, 6]), "y"].to_numpy(float))
    rows = quantile_treatment_effects(spark, SF_DIR).collect()
    assert len(rows) == 9
    for r in rows:
        tau = r["decile"] / 10.0
        qw = np.quantile(we, tau)  # numpy default = type-7
        qd = np.quantile(wd, tau)
        assert abs(r["q_weekend"] - qw) < 1e-4
        assert abs(r["q_weekday"] - qd) < 1e-4
        assert abs(r["qte"] - (qw - qd)) < 1e-4


def test_propensity_ate_matches_pandas(spark):
    from zoom_spark.queries.round10c_ops import propensity_stratified_ate

    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_totalprice"
    ).toPandas()
    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment"
    ).toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["treat"] = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    j["yr"] = j["o_orderdate"].dt.year
    j["cents"] = np.floor(j["o_totalprice"] * 100 + 0.5).astype(np.int64)
    crude = (
        j.loc[j["treat"] == 1, "cents"].mean()
        - j.loc[j["treat"] == 0, "cents"].mean()
    ) / 100.0
    num, n_used, k = 0.0, 0, 0
    for _, g in j.groupby(["c_mktsegment", "yr"]):
        g1 = g.loc[g["treat"] == 1, "cents"]
        g0 = g.loc[g["treat"] == 0, "cents"]
        if len(g1) == 0 or len(g0) == 0:
            continue
        k += 1
        n_used += len(g)
        num += (g1.mean() - g0.mean()) * len(g)
    strat = num / n_used / 100.0
    [r] = propensity_stratified_ate(spark, SF_DIR).collect()
    assert r["k_strata"] == k
    assert r["n_used"] == n_used
    assert abs(r["crude_diff"] - crude) < 1e-4
    assert abs(r["stratified_ate"] - strat) < 1e-4
    assert abs(r["confounding_bias"] - (crude - strat)) < 1e-4


def test_its_segmented_matches_polyfit(spark):
    from zoom_spark.queries.round10c_ops import its_segmented_regression

    d = _daily_revenue(spark)
    y = d["y"].to_numpy(float)
    n = len(y)
    t = np.arange(1, n + 1, dtype=float)
    brk = n // 2
    pre, post = t <= brk, t > brk
    b_pre = np.polyfit(t[pre], y[pre], 1)
    b_post = np.polyfit(t[post], y[post], 1)
    t0 = brk + 1
    level = (b_post[1] + b_post[0] * t0) - (b_pre[1] + b_pre[0] * t0)
    [r] = its_segmented_regression(spark, SF_DIR).collect()
    assert r["n_pre"] == int(pre.sum())
    assert r["n_post"] == int(post.sum())
    assert abs(r["slope_pre"] - b_pre[0]) < 1e-3
    assert abs(r["slope_post"] - b_post[0]) < 1e-3
    assert abs(r["slope_change"] - (b_post[0] - b_pre[0])) < 1e-3
    assert abs(r["level_change"] - level) < 1e-2


def test_nadaraya_watson_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import nadaraya_watson_smoother

    d = _daily_revenue(spark)
    y = d["y"].to_numpy(float)
    n = len(y)
    t = np.arange(1, n + 1, dtype=float)
    rows = nadaraya_watson_smoother(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        t0 = 1 + math.floor((r["grid_point"] - 1) * (n - 1) / 19.0)
        assert r["day_index"] == t0
        mask = np.abs(t - t0) <= 120
        w = np.exp(-((t[mask] - t0) ** 2) / (2 * 30.0**2))
        expect = (w * y[mask]).sum() / w.sum()
        assert abs(r["smoothed"] - expect) < 1e-2


def test_tost_matches_textbook(spark):
    from zoom_spark.queries.round10c_ops import tost_equivalence_weekend

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    epoch = pd.Timestamp("1990-01-01")
    wk = ((o["o_orderdate"].dt.normalize() - epoch).dt.days % 7).isin(
        [5, 6]
    )
    x = (
        np.floor(o["o_totalprice"] * 100 + 0.5).astype(np.int64) // 100
    ).astype(float)
    g1, g0 = x[wk].to_numpy(), x[~wk].to_numpy()
    diff = g1.mean() - g0.mean()
    se = math.sqrt(
        g1.var(ddof=1) / len(g1) + g0.var(ddof=1) / len(g0)
    )
    margin = 0.01 * x.mean()
    zl, zu = (diff + margin) / se, (diff - margin) / se
    pl, pu = 1 - _phi(zl), _phi(zu)
    [r] = tost_equivalence_weekend(spark, SF_DIR).collect()
    assert r["n_weekend"] == len(g1)
    assert r["n_weekday"] == len(g0)
    assert abs(r["mean_diff"] - diff) < 1e-4
    assert abs(r["equivalence_margin"] - margin) < 1e-4
    assert abs(r["z_lower"] - zl) < 1e-4
    assert abs(r["z_upper"] - zu) < 1e-4
    assert abs(r["p_tost"] - max(pl, pu)) < 1e-4
    assert r["equivalent_at_05"] == (1 if max(pl, pu) < 0.05 else 0)


def test_hash_uniformity_cvm_matches_python(spark):
    from zoom_spark.queries.round10c_ops import hash_uniformity_cvm

    o = load_table(spark, SF_DIR, "orders").select("o_orderkey").toPandas()
    u = np.sort(
        np.array(
            [
                _md5_int(str(k)) / 1152921504606846976.0
                for k in o["o_orderkey"]
            ]
        )
    )
    n = len(u)
    i = np.arange(1, n + 1)
    w2 = 1.0 / (12 * n) + (((u - (2 * i - 1) / (2 * n)) ** 2).sum())
    [r] = hash_uniformity_cvm(spark, SF_DIR).collect()
    assert r["n_keys"] == n
    assert abs(r["w2_stat"] - w2) < 1e-4
    assert abs(r["w2_adjusted"] - w2 / (1 + 0.5 / n)) < 1e-4
    # md5 should look uniform: W2 firmly below the 1% critical value
    assert r["w2_stat"] < 0.743


def test_yule_walker_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import yule_walker_ar2

    d = _daily_revenue(spark)
    y = d["y"].to_numpy(float)
    n = len(y)
    ybar = y.mean()
    c0 = ((y - ybar) ** 2).sum()

    def r(k):
        return (((y[:-k] - ybar) * (y[k:] - ybar)).sum()) / c0

    r1, r2 = r(1), r(2)
    phi1 = r1 * (1 - r2) / (1 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    [row] = yule_walker_ar2(spark, SF_DIR).collect()
    assert row["n_days"] == n
    assert abs(row["acf1"] - r1) < 1e-6
    assert abs(row["acf2"] - r2) < 1e-6
    assert abs(row["phi1"] - phi1) < 1e-5
    assert abs(row["phi2"] - phi2) < 1e-5
    # Durbin-Levinson: phi2 equals the lag-2 PACF
    sigma2 = (c0 / n) * (1 - phi1 * r1 - phi2 * r2)
    assert abs(row["sigma2"] - sigma2) < max(1e-6 * sigma2, 1e-3)


def test_haar_energy_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import haar_wavelet_energy

    d = _daily_revenue(spark)
    y = (d["y"].to_numpy() // 1000) * 64
    n = (len(y) // 64) * 64
    s = y[:n].astype(np.int64)
    expected = []
    for lvl in range(1, 7):
        a = (s[0::2] + s[1::2]) // 2
        w = (s[0::2] - s[1::2]) // 2
        expected.append((lvl, len(w), int((w.astype(object) ** 2).sum())))
        s = a
    rows = haar_wavelet_energy(spark, SF_DIR).collect()
    total = sum(e for _, _, e in expected)
    assert len(rows) == 6
    for r, (lvl, ncf, en) in zip(rows, expected):
        assert r["level"] == lvl
        assert r["n_coeffs"] == ncf
        assert r["energy"] == en
        assert abs(r["energy_frac"] - en / total) < 1e-6


def test_sax_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import sax_symbolic_revenue

    d = _daily_revenue(spark)
    y = d["y"].to_numpy(float)
    n = len(y)
    seg = (np.arange(n) * 16) // n
    mu, sd = y.mean(), y.std(ddof=1)
    rows = sax_symbolic_revenue(spark, SF_DIR).collect()
    assert len(rows) == 16
    for r in rows:
        vals = y[seg == r["segment"]]
        m = vals.mean()
        z = (m - mu) / sd
        sym = "a" if z < -0.6745 else "b" if z < 0 else "c" if z < 0.6745 else "d"
        assert r["n_days"] == len(vals)
        assert abs(r["paa_mean"] - m) < 1e-4
        assert abs(r["z_score"] - z) < 1e-5
        assert r["symbol"] == sym


def test_dtw_matches_python(spark):
    from zoom_spark.queries.round10c_ops import dtw_weekly_profiles

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    epoch = pd.Timestamp("1990-01-01")
    o["day"] = o["o_orderdate"].dt.normalize()
    o["dow"] = ((o["day"] - epoch).dt.days % 7).astype(int)
    o["cents"] = np.floor(o["o_totalprice"] * 100 + 0.5).astype(np.int64)
    d0, d1 = o["day"].min(), o["day"].max()
    mid = d0 + pd.Timedelta(days=(d1 - d0).days // 2)
    o["half"] = (o["day"] > mid).astype(int)
    prof = {}
    for (dow, half), g in o.groupby(["dow", "half"]):
        prof[(dow, half)] = (
            math.floor(g["cents"].mean() / 100.0 * 1e6 + 0.5) / 1e6
        )
    a = [prof[(i, 0)] for i in range(7)]
    b = [prof[(i, 1)] for i in range(7)]
    inf = float("inf")
    g = [[inf] * 8 for _ in range(8)]
    g[1][1] = abs(a[0] - b[0])
    for i in range(1, 8):
        for j in range(1, 8):
            if (i, j) == (1, 1):
                continue
            prev = min(
                g[i - 1][j] if i > 1 else inf,
                g[i][j - 1] if j > 1 else inf,
                g[i - 1][j - 1] if i > 1 and j > 1 else inf,
            )
            g[i][j] = abs(a[i - 1] - b[j - 1]) + prev
    l1 = sum(abs(x - yv) for x, yv in zip(a, b))
    [r] = dtw_weekly_profiles(spark, SF_DIR).collect()
    assert abs(r["dtw_distance"] - g[7][7]) < 1e-4
    assert abs(r["dtw_per_step"] - g[7][7] / 7.0) < 1e-4
    assert abs(r["euclidean_l1"] - l1) < 1e-4
    # warping can only help: DTW <= L1
    assert r["dtw_distance"] <= r["euclidean_l1"] + 1e-9


def _week_pairs(spark):
    d = _daily_revenue(spark)
    by_day = dict(zip(d["day"], d["y"]))
    diffs = []
    for day, y in by_day.items():
        nxt = day + pd.Timedelta(days=7)
        nxt = (pd.Timestamp(day) + pd.Timedelta(days=7)).date()
        if nxt in by_day and by_day[nxt] != y:
            diffs.append(int(by_day[nxt]) - int(y))
    return np.array(diffs, dtype=np.int64)


def test_wilcoxon_signed_rank_matches_textbook(spark):
    from zoom_spark.queries.round10c_ops import wilcoxon_signed_rank_weeks

    diffs = _week_pairs(spark)
    n = len(diffs)
    order = np.abs(diffs)
    # midranks (manual; no scipy in this container)
    uniq, counts = np.unique(order, return_counts=True)
    start = {}
    c = 0
    for u, cnt in zip(uniq, counts):
        start[u] = c + (cnt + 1) / 2.0
        c += cnt
    ranks = np.array([start[a] for a in order])
    w_plus = ranks[diffs > 0].sum()
    tie3 = sum(int(t) ** 3 - int(t) for t in counts)
    var = (n * (n + 1) * (2 * n + 1)) / 24.0 - tie3 / 48.0
    z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(var)
    [r] = wilcoxon_signed_rank_weeks(spark, SF_DIR).collect()
    assert r["n_pairs"] == n
    assert r["w2_plus"] == round(2 * w_plus)
    assert abs(r["z_stat"] - z) < 1e-5
    assert abs(r["p_value"] - 2 * (1 - _phi(abs(z)))) < 1e-4


def test_sign_test_matches_textbook(spark):
    from zoom_spark.queries.round10c_ops import sign_test_adjacent_weeks

    diffs = _week_pairs(spark)
    n = len(diffs)
    s = int((diffs > 0).sum())
    cc = 1.0 if 2 * s > n else -1.0 if 2 * s < n else 0.0
    z = (2 * s - n - cc) / math.sqrt(n)
    [r] = sign_test_adjacent_weeks(spark, SF_DIR).collect()
    assert r["n_pairs"] == n
    assert r["n_pos"] == s
    assert abs(r["frac_up"] - s / n) < 1e-6
    assert abs(r["z_stat"] - z) < 1e-5
    assert abs(r["p_value"] - 2 * (1 - _phi(abs(z)))) < 1e-4


def test_ad_two_sample_matches_textbook(spark):
    from zoom_spark.queries.round10c_ops import anderson_darling_two_sample

    d = _daily_revenue(spark)
    wk = d["dow"].isin([5, 6]).to_numpy()
    y = d["y"].to_numpy()
    nn = len(y)
    n1, n0 = int(wk.sum()), int((~wk).sum())
    # Scholz-Stephens midrank A2akN, k=2, from the paper's eq. (7)
    uniq = np.unique(y)
    a2 = 0.0
    for na, sel in ((n1, wk), (n0, ~wk)):
        inner = 0.0
        cum_l = 0
        cum_la = 0
        for v in uniq:
            l = int((y == v).sum())
            la = int(((y == v) & sel).sum())
            bj = cum_l + l / 2.0
            maj = cum_la + la / 2.0
            den = bj * (nn - bj) - nn * l / 4.0
            if den > 0:
                inner += l * (nn * maj - na * bj) ** 2 / den
            cum_l += l
            cum_la += la
        a2 += inner / na
    a2 *= (nn - 1) / nn / nn
    [r] = anderson_darling_two_sample(spark, SF_DIR).collect()
    assert r["n_weekend"] == n1
    assert r["n_weekday"] == n0
    assert abs(r["a2_stat"] - a2) < 1e-4


def test_bws_matches_textbook(spark):
    from zoom_spark.queries.round10c_ops import bws_test_weekend

    d = _daily_revenue(spark)
    wk = d["dow"].isin([5, 6]).to_numpy()
    y = d["y"].to_numpy(float)
    nn = len(y)
    # pooled midranks
    order = np.argsort(y, kind="stable")
    ranks = np.empty(nn)
    sy = y[order]
    i = 0
    while i < nn:
        j = i
        while j < nn and sy[j] == sy[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    bs = {}
    for label, sel in (("x", wk), ("y", ~wk)):
        n = int(sel.sum())
        m = nn - n
        rr = np.sort(ranks[sel])
        idx = np.arange(1, n + 1)
        num = (rr - nn * idx / n) ** 2
        den = (idx / (n + 1)) * (1 - idx / (n + 1)) * (m * nn / n)
        bs[label] = (num / den).sum() / n
    [r] = bws_test_weekend(spark, SF_DIR).collect()
    assert abs(r["b_weekend"] - bs["x"]) < 1e-4
    assert abs(r["b_weekday"] - bs["y"]) < 1e-4
    assert abs(r["bws_stat"] - (bs["x"] + bs["y"]) / 2) < 1e-4


def test_empirical_copula_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import empirical_copula_dependence

    j = _customer_frame(spark)
    j["bal_cents"] = np.floor(j["c_acctbal"] * 100 + 0.5).astype(np.int64)
    n = len(j)
    ru = (
        j.sort_values(["bal_cents", "c_custkey"])
        .reset_index()
        .sort_values("index")
        .index.to_numpy()
    )
    # recompute ranks properly: rank position of each row
    order_u = np.lexsort((j["c_custkey"], j["bal_cents"]))
    order_v = np.lexsort((j["c_custkey"], j["spend"]))
    ru = np.empty(n, dtype=int)
    rv = np.empty(n, dtype=int)
    ru[order_u] = np.arange(1, n + 1)
    rv[order_v] = np.arange(1, n + 1)
    cu = (ru - 1) * 8 // n
    cv = (rv - 1) * 8 // n
    hist = np.zeros((8, 8), dtype=np.int64)
    for a, b in zip(cu, cv):
        hist[a, b] += 1
    s = 0.0
    for a in range(8):
        for b in range(8):
            c = hist[: a + 1, : b + 1].sum() / n
            s += abs(c - ((a + 1) / 8) * ((b + 1) / 8))
    sigma = 12.0 * s / 64.0
    [r] = empirical_copula_dependence(spark, SF_DIR).collect()
    assert r["n_customers"] == n
    assert abs(r["schweizer_wolff_sigma"] - sigma) < 1e-4
    assert abs(r["mean_abs_dev"] - s / 64.0) < 1e-5
    assert 0.0 <= r["schweizer_wolff_sigma"] <= 1.0 + 1e-9


def test_frequent_triples_matches_pandas(spark):
    from itertools import combinations

    from zoom_spark.queries.round10c_ops import frequent_triples

    li = _baskets(spark)
    cnt = {}
    for _, g in li.groupby("l_orderkey"):
        for t in combinations(sorted(g["l_partkey"]), 3):
            cnt[t] = cnt.get(t, 0) + 1
    cand = sorted(
        ((c, t) for t, c in cnt.items() if c >= 2),
        key=lambda x: (-x[0], x[1]),
    )[:20]
    rows = frequent_triples(spark, SF_DIR).collect()
    assert len(rows) == min(20, len(cand))
    for r, (c, t) in zip(rows, cand):
        assert (r["item_1"], r["item_2"], r["item_3"]) == t
        assert r["support"] == c


def test_var_cvar_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import var_cvar_revenue_changes

    d = _daily_revenue(spark)
    chg = np.diff(d["y"].to_numpy()).astype(np.int64)
    s = np.sort(chg)
    n = len(s)
    rows = var_cvar_revenue_changes(spark, SF_DIR).collect()
    assert [r["alpha"] for r in rows] == [0.05, 0.01]
    for r in rows:
        k = math.ceil(r["alpha"] * n)
        assert r["n_changes"] == n
        assert r["tail_n"] == k
        assert r["var_loss"] == -int(s[k - 1])
        assert abs(r["cvar_loss"] - (-s[:k].mean())) < 1e-6
        # coherence: expected shortfall dominates VaR
        assert r["cvar_loss"] >= r["var_loss"] - 1e-9


def test_performance_panel_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import performance_ratio_panel

    d = _daily_revenue(spark)
    y = d["y"].to_numpy().astype(np.int64)
    chg = np.diff(y).astype(float)
    mean, sd = chg.mean(), chg.std(ddof=1)
    sortino = mean / math.sqrt((chg[chg < 0] ** 2).sum() / len(chg))
    peak = np.maximum.accumulate(y)
    mdd = int((peak - y).max())
    ulcer = math.sqrt((((peak - y) / peak) ** 2).mean())
    [r] = performance_ratio_panel(spark, SF_DIR).collect()
    assert r["n_changes"] == len(chg)
    assert abs(r["sharpe"] - mean / sd) < 1e-5
    assert abs(r["sortino"] - sortino) < 1e-5
    assert r["max_drawdown"] == mdd
    assert abs(r["ulcer_index"] - ulcer) < 1e-5
    assert abs(r["calmar_like"] - mean / mdd) < 1e-6


def test_dunn_posthoc_matches_textbook(spark):
    from zoom_spark.queries.round10c_ops import dunn_posthoc_segments

    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment"
    ).toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["x"] = (
        np.floor(j["o_totalprice"] * 100 + 0.5).astype(np.int64) // 100
    )
    x = j["x"].to_numpy()
    nn = len(x)
    # pooled midranks
    order = np.argsort(x, kind="stable")
    ranks = np.empty(nn)
    sx = x[order]
    i = 0
    while i < nn:
        k = i
        while k < nn and sx[k] == sx[i]:
            k += 1
        ranks[order[i:k]] = (i + 1 + k) / 2.0
        i = k
    j["rank"] = ranks
    _, counts = np.unique(x, return_counts=True)
    tie3 = sum(int(t) ** 3 - int(t) for t in counts)
    groups = {
        s: g["rank"].to_numpy() for s, g in j.groupby("c_mktsegment")
    }
    segs = sorted(groups)
    rows = dunn_posthoc_segments(spark, SF_DIR).collect()
    assert len(rows) == 10
    idx = 0
    for ai in range(len(segs)):
        for bi in range(ai + 1, len(segs)):
            sa, sb = segs[ai], segs[bi]
            ga, gb = groups[sa], groups[sb]
            z = (ga.mean() - gb.mean()) / math.sqrt(
                (nn * (nn + 1) / 12 - tie3 / (12 * (nn - 1)))
                * (1 / len(ga) + 1 / len(gb))
            )
            r = rows[idx]
            idx += 1
            assert (r["seg_a"], r["seg_b"]) == (sa, sb)
            assert (r["n_a"], r["n_b"]) == (len(ga), len(gb))
            assert abs(r["z_stat"] - z) < 1e-5
            assert abs(
                r["p_bonferroni"] - min(1.0, 20 * (1 - _phi(abs(z))))
            ) < 1e-4


def test_median_polish_matches_python(spark):
    from zoom_spark.queries.round10c_ops import median_polish_dow_priority

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_orderpriority", "o_totalprice"
    ).toPandas()
    epoch = pd.Timestamp("1990-01-01")
    o["dow"] = ((o["o_orderdate"].dt.normalize() - epoch).dt.days % 7)
    o["cents"] = np.floor(o["o_totalprice"] * 100 + 0.5).astype(np.int64)
    tbl = {}
    for (dow, pri), g in o.groupby(["dow", "o_orderpriority"]):
        tbl[(dow, pri)] = math.floor(g["cents"].mean() + 0.5)
    dows = sorted({k[0] for k in tbl})
    pris = sorted({k[1] for k in tbl})
    resid = {k: v for k, v in tbl.items()}
    dow_eff = {d: 0 for d in dows}
    pri_eff = {p: 0 for p in pris}

    def med_sorted(vals):
        return sorted(vals)[len(vals) // 2]

    for _ in range(2):
        for d in dows:
            m = med_sorted([resid[(d, p)] for p in pris])
            for p in pris:
                resid[(d, p)] -= m
            dow_eff[d] += m
        for p in pris:
            m = med_sorted([resid[(d, p)] for d in dows])
            for d in dows:
                resid[(d, p)] -= m
            pri_eff[p] += m
    rows = median_polish_dow_priority(spark, SF_DIR).collect()
    assert len(rows) == 35
    for r in rows:
        key = (r["dow"], r["pri"])
        assert abs(r["residual"] - resid[key] / 100.0) < 1e-9
        assert abs(r["dow_effect"] - dow_eff[r["dow"]] / 100.0) < 1e-9
        assert abs(r["pri_effect"] - pri_eff[r["pri"]] / 100.0) < 1e-9


def test_process_capability_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import process_capability_daily

    d = _daily_revenue(spark)
    y = d["y"].to_numpy(float)
    n = len(y)
    mu, sig_o = y.mean(), y.std(ddof=1)
    k = n // 7
    ranges = [
        y[i * 7 : i * 7 + 7].max() - y[i * 7 : i * 7 + 7].min()
        for i in range(k)
    ]
    sig_w = (sum(ranges) / k) / 2.704
    lsl, usl = 0.8 * mu, 1.2 * mu
    [r] = process_capability_daily(spark, SF_DIR).collect()
    assert r["n_days"] == n
    assert r["n_subgroups"] == k
    assert abs(r["mean_revenue"] - mu) < 1e-3
    assert abs(r["sigma_within"] - sig_w) < 1e-3
    assert abs(r["sigma_overall"] - sig_o) < 1e-3
    assert abs(r["cp"] - (usl - lsl) / (6 * sig_w)) < 1e-5
    assert abs(r["cpk"] - min(usl - mu, mu - lsl) / (3 * sig_w)) < 1e-5
    assert abs(r["pp"] - (usl - lsl) / (6 * sig_o)) < 1e-5
    assert abs(r["ppk"] - min(usl - mu, mu - lsl) / (3 * sig_o)) < 1e-5
    # symmetric specs => cpk == cp and ppk == pp
    assert abs(r["cp"] - r["cpk"]) < 1e-6


def test_mcf_matches_python(spark):
    from zoom_spark.queries.round10c_ops import mean_cumulative_function

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_type"
    ).toPandas()
    ev["day"] = ev["ts"].dt.normalize()
    first = ev.groupby("user_id")["day"].min()
    horizon = ev["day"].max()
    pur = ev[ev["event_type"] == "purchase"]
    ages = (
        (pur["day"] - pur["user_id"].map(first)).dt.days.to_numpy()
    )
    follow = (horizon - first).dt.days.to_numpy()
    mcf = {}
    acc = 0.0
    for a in sorted(set(ages)):
        d = int((ages == a).sum())
        n_risk = int((follow >= a).sum())
        acc += math.floor(d / n_risk * 1e9 + 0.5) / 1e9
        mcf[a] = (d, n_risk, acc)
    rows = mean_cumulative_function(spark, SF_DIR).collect()
    assert rows
    prev = 0.0
    for r in rows:
        d, n_risk, acc = mcf[r["age"]]
        assert r["n_events"] == d
        assert r["n_risk"] == n_risk
        assert abs(r["mcf"] - acc) < 1e-6
        # MCF is nondecreasing
        assert r["mcf"] >= prev - 1e-12
        prev = r["mcf"]


def test_attribute_assortativity_matches_python(spark):
    from itertools import combinations

    from zoom_spark.queries.round10c_ops import (
        attribute_assortativity_brand,
    )

    li = _baskets(spark)
    pt = load_table(spark, SF_DIR, "part").select(
        "p_partkey", "p_brand"
    ).toPandas()
    brand = dict(zip(pt["p_partkey"], pt["p_brand"]))
    edges = set()
    for _, g in li.groupby("l_orderkey"):
        for u, v in combinations(sorted(g["l_partkey"]), 2):
            edges.add((u, v))
    mix = {}
    for u, v in edges:
        for bi, bj in ((brand[u], brand[v]), (brand[v], brand[u])):
            mix[(bi, bj)] = mix.get((bi, bj), 0) + 1
    m2 = sum(mix.values())
    tr = sum(v for (bi, bj), v in mix.items() if bi == bj) / m2
    ends = {}
    for (bi, bj), v in mix.items():
        ends[bi] = ends.get(bi, 0) + v
    a2 = sum(v * v for v in ends.values()) / (m2 * m2)
    r_exp = (tr - a2) / (1 - a2)
    [r] = attribute_assortativity_brand(spark, SF_DIR).collect()
    assert r["n_edges"] == len(edges)
    assert r["n_brands"] == len(ends)
    assert abs(r["frac_same_brand"] - tr) < 1e-6
    assert abs(r["assortativity_r"] - r_exp) < 1e-5
    assert -1.0 <= r["assortativity_r"] <= 1.0


def test_classical_mds_matches_numpy_eig(spark):
    from zoom_spark.queries.round10c_ops import classical_mds_nations

    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    ).toPandas()
    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.floor(j["o_totalprice"] * 100 + 0.5).astype(np.int64)
    prof = {}
    for (nat, pri), g in j.groupby(["c_nationkey", "o_orderpriority"]):
        prof[(nat, pri)] = (
            math.floor(g["cents"].mean() / 100.0 * 1e6 + 0.5) / 1e6
        )
    nations = sorted({k[0] for k in prof})
    pris = sorted({k[1] for k in prof})
    x = np.array([[prof[(n, p)] for p in pris] for n in nations])
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2)
    n = len(nations)
    jc = np.eye(n) - np.ones((n, n)) / n
    bmat = -0.5 * jc @ d2 @ jc
    ev, vec = np.linalg.eigh(bmat)
    order = np.argsort(ev)[::-1]
    l1, l2 = ev[order[0]], ev[order[1]]
    v1, v2 = vec[:, order[0]], vec[:, order[1]]
    rows = classical_mds_nations(spark, SF_DIR).collect()
    assert len(rows) == n
    assert abs(rows[0]["eigval1"] - l1) < max(1e-3 * abs(l1), 1.0)
    assert abs(rows[0]["eigval2"] - l2) < max(5e-3 * abs(l2), 1.0)
    assert rows[0]["eigval1"] >= rows[0]["eigval2"] >= -1e-6
    c1 = np.array([r["coord1"] for r in rows])
    c2 = np.array([r["coord2"] for r in rows])
    e1 = math.sqrt(max(l1, 0)) * v1
    e2 = math.sqrt(max(l2, 0)) * v2
    # sign-invariant comparison; 8 power-iteration rounds approximate
    scale1 = np.abs(e1).max()
    scale2 = np.abs(e2).max()
    assert min(
        np.abs(c1 - e1).max(), np.abs(c1 + e1).max()
    ) < 0.02 * scale1
    assert min(
        np.abs(c2 - e2).max(), np.abs(c2 + e2).max()
    ) < 0.05 * scale2


def _int_clouds(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "label", "embedding"
    ).toPandas()
    q = 1_000_000

    def iv(e):
        return np.floor(np.asarray(e, dtype=np.float64) * q + 0.5).astype(
            np.int64
        )

    a = np.stack([iv(e) for e in emb.loc[emb["label"] == 0, "embedding"]])
    b = np.stack([iv(e) for e in emb.loc[emb["label"] == 1, "embedding"]])
    return a, b


def test_hausdorff_chamfer_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import hausdorff_chamfer_labels

    a, b = _int_clouds(spark)
    q = 1_000_000
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=2)
    mins_a = d2.min(axis=1)
    mins_b = d2.min(axis=0)
    h_ab = math.sqrt(mins_a.max()) / q
    h_ba = math.sqrt(mins_b.max()) / q
    chamfer = (
        np.floor(np.sqrt(mins_a.astype(float)) + 0.5).mean()
        + np.floor(np.sqrt(mins_b.astype(float)) + 0.5).mean()
    ) / 2 / q
    [r] = hausdorff_chamfer_labels(spark, SF_DIR).collect()
    assert r["n_label0"] == len(a)
    assert r["n_label1"] == len(b)
    assert abs(r["hausdorff"] - max(h_ab, h_ba)) < 1e-5
    assert abs(r["hausdorff_0_to_1"] - h_ab) < 1e-5
    assert abs(r["hausdorff_1_to_0"] - h_ba) < 1e-5
    assert abs(r["chamfer"] - chamfer) < 1e-5
    # Chamfer (a mean) never exceeds Hausdorff (the max)
    assert r["chamfer"] <= r["hausdorff"] + 1e-9


def test_energy_distance_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import energy_distance_labels

    a, b = _int_clouds(spark)
    q = 1_000_000

    def mean_dist(x, y):
        d2 = ((x[:, None, :] - y[None, :, :]) ** 2).sum(axis=2)
        return np.floor(np.sqrt(d2.astype(float)) + 0.5).mean()

    exy = mean_dist(a, b)
    exx = mean_dist(a, a)
    eyy = mean_dist(b, b)
    e = (2 * exy - exx - eyy) / q
    [r] = energy_distance_labels(spark, SF_DIR).collect()
    assert r["n_cross_pairs"] == len(a) * len(b)
    assert abs(r["energy_distance"] - e) < 1e-5
    assert r["energy_distance"] >= -1e-9


def test_mmd_rbf_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import mmd_rbf_labels

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "label", "embedding"
    ).toPandas()
    emb = emb[emb["label"].isin([0, 1])].sort_values("vec_id")
    q = 1_000_000
    vecs = np.stack(
        [
            np.floor(np.asarray(e, dtype=np.float64) * q + 0.5)
            for e in emb["embedding"]
        ]
    ).astype(np.int64)
    labels = emb["label"].to_numpy()
    n = len(vecs)
    d2 = ((vecs[:, None, :] - vecs[None, :, :]) ** 2).sum(axis=2)
    iu = np.triu_indices(n, k=1)
    pair_d2 = d2[iu]
    s = np.sort(pair_d2)
    m = len(s)
    med2x = int(s[(m + 1) // 2 - 1]) + int(s[m // 2])
    kmat = np.floor(np.exp(-d2.astype(float) / med2x) * 1e9 + 0.5) / 1e9
    la = labels[iu[0]]
    lb = labels[iu[1]]
    kp = kmat[iu]
    kxx = kp[(la == 0) & (lb == 0)].mean()
    kyy = kp[(la == 1) & (lb == 1)].mean()
    kxy = kp[la != lb].mean()
    mmd2 = kxx + kyy - 2 * kxy
    [r] = mmd_rbf_labels(spark, SF_DIR).collect()
    assert r["n_label0"] == int((labels == 0).sum())
    assert r["n_label1"] == int((labels == 1).sum())
    assert abs(r["sigma2_median"] - med2x / 2 / (q * q)) < 1e-5
    assert abs(r["k_xx"] - kxx) < 1e-5
    assert abs(r["k_yy"] - kyy) < 1e-5
    assert abs(r["k_xy"] - kxy) < 1e-5
    assert abs(r["mmd2"] - mmd2) < 1e-5
    # the U-statistic (unordered-pairs) MMD^2 estimator may dip
    # slightly negative under H0; only the V-statistic is >= 0
    assert r["mmd2"] >= -0.05


def test_price_index_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import price_index_halves

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_quantity"
    ).toPandas()
    li["day"] = li["l_shipdate"].dt.normalize()
    d0, d1 = li["day"].min(), li["day"].max()
    mid = d0 + pd.Timedelta(days=(d1 - d0).days // 2)
    li["half"] = (li["day"] > mid).astype(int)
    li["cents"] = np.floor(li["l_extendedprice"] * 100 + 0.5).astype(
        np.int64
    )
    li["qty"] = np.floor(li["l_quantity"] + 0.5).astype(np.int64)
    g = li.groupby(["l_partkey", "half"]).agg(
        sc=("cents", "sum"), sq=("qty", "sum")
    )
    h0 = g.xs(0, level="half")
    h1 = g.xs(1, level="half")
    common = h0.index.intersection(h1.index)
    p0 = (h0.loc[common, "sc"] / h0.loc[common, "sq"]).to_numpy()
    q0 = h0.loc[common, "sq"].to_numpy(float)
    p1 = (h1.loc[common, "sc"] / h1.loc[common, "sq"]).to_numpy()
    q1 = h1.loc[common, "sq"].to_numpy(float)
    lasp = (p1 * q0).sum() / (p0 * q0).sum()
    paas = (p1 * q1).sum() / (p0 * q1).sum()
    w = 0.5 * (
        p0 * q0 / (p0 * q0).sum() + p1 * q1 / (p1 * q1).sum()
    )
    torn = math.exp((w * np.log(p1 / p0)).sum())
    [r] = price_index_halves(spark, SF_DIR).collect()
    assert r["n_parts_matched"] == len(common)
    assert abs(r["laspeyres"] - lasp) < 1e-4
    assert abs(r["paasche"] - paas) < 1e-4
    assert abs(r["fisher"] - math.sqrt(lasp * paas)) < 1e-4
    assert abs(r["tornqvist"] - torn) < 1e-4
    # Fisher lies between Laspeyres and Paasche
    lo, hi = min(lasp, paas), max(lasp, paas)
    assert lo - 1e-9 <= r["fisher"] <= hi + 1e-9


def test_greedy_matching_matches_python(spark):
    from itertools import combinations

    from zoom_spark.queries.round10c_ops import greedy_maximal_matching

    li = _baskets(spark)
    sup = {}
    for _, g in li.groupby("l_orderkey"):
        for u, v in combinations(sorted(g["l_partkey"]), 2):
            sup[(u, v)] = sup.get((u, v), 0) + 1
    edges = {
        (u, v): (1000000 - s) * 10**12 + u * 10**6 + v
        for (u, v), s in sup.items()
        if s >= 2
    }
    # replicate the mutual-min rounds exactly
    alive = dict(edges)
    matched = []
    for _ in range(8):
        if not alive:
            break
        mu = {}
        for (u, v), w in alive.items():
            mu[u] = min(mu.get(u, w), w)
            mu[v] = min(mu.get(v, w), w)
        m = [
            (u, v, w)
            for (u, v), w in alive.items()
            if mu[u] == w and mu[v] == w
        ]
        matched.extend(m)
        used = {u for u, v, w in m} | {v for u, v, w in m}
        alive = {
            (u, v): w
            for (u, v), w in alive.items()
            if u not in used and v not in used
        }
    [r] = greedy_maximal_matching(spark, SF_DIR).collect()
    assert r["n_edges"] == len(edges)
    assert r["matching_size"] == len(matched)
    assert r["leftover_edges"] == len(alive)
    assert r["matched_support"] == sum(
        1000000 - w // 10**12 for _, _, w in matched
    )
    # converged to a MAXIMAL matching at this SF
    assert r["leftover_edges"] == 0
    # matching property: no vertex twice
    verts = [x for u, v, w in matched for x in (u, v)]
    assert len(verts) == len(set(verts))


def test_luby_mis_matches_python(spark):
    import hashlib
    from itertools import combinations

    from zoom_spark.queries.round10c_ops import (
        luby_maximal_independent_set,
    )

    li = _baskets(spark)
    sup = {}
    for _, g in li.groupby("l_orderkey"):
        for u, v in combinations(sorted(g["l_partkey"]), 2):
            sup[(u, v)] = sup.get((u, v), 0) + 1
    edges = [e for e, s in sup.items() if s >= 2]
    verts = sorted({x for e in edges for x in e})

    def pr(x):
        return (
            int(hashlib.md5(str(x).encode()).hexdigest()[:10], 16)
            * 1000000
            + x
        )

    alive_v = set(verts)
    alive_e = list(edges)
    mis = set()
    for _ in range(8):
        if not alive_v:
            break
        nbr_min = {}
        for u, v in alive_e:
            nbr_min[u] = min(nbr_min.get(u, float("inf")), pr(v))
            nbr_min[v] = min(nbr_min.get(v, float("inf")), pr(u))
        c = {
            x
            for x in alive_v
            if x not in nbr_min or pr(x) < nbr_min[x]
        }
        mis |= c
        removed = set(c)
        for u, v in alive_e:
            if u in c:
                removed.add(v)
            if v in c:
                removed.add(u)
        alive_v -= removed
        alive_e = [
            (u, v)
            for u, v in alive_e
            if u not in removed and v not in removed
        ]
    [r] = luby_maximal_independent_set(spark, SF_DIR).collect()
    assert r["n_vertices"] == len(verts)
    assert r["n_edges"] == len(edges)
    assert r["mis_size"] == len(mis)
    assert r["leftover_vertices"] == len(alive_v)
    # converged and independent at this SF
    assert r["leftover_vertices"] == 0
    es = set(edges)
    assert not any(
        (u, v) in es for u in mis for v in mis if u < v
    )


def _cells_labels_contingency(spark):
    from zoom_spark.queries.round10c_ops import _cells_vs_labels

    rows = _cells_vs_labels(spark, SF_DIR).collect()
    ct = {}
    for r in rows:
        ct[(r["cell"], r["label"])] = r["nij"]
    return ct


def test_ari_matches_textbook(spark):
    from zoom_spark.queries.round10c_ops import adjusted_rand_index_cells

    ct = _cells_labels_contingency(spark)
    n = sum(ct.values())
    tp = sum(v * (v - 1) // 2 for v in ct.values())
    a = {}
    b = {}
    for (c, l), v in ct.items():
        a[c] = a.get(c, 0) + v
        b[l] = b.get(l, 0) + v
    sa = sum(v * (v - 1) // 2 for v in a.values())
    sb = sum(v * (v - 1) // 2 for v in b.values())
    npairs = n * (n - 1) / 2
    exp = sa * sb / npairs
    ari = (tp - exp) / ((sa + sb) / 2 - exp)
    fm = tp / math.sqrt(sa * sb)
    ri = (tp + (npairs - sa - sb + tp)) / npairs
    [r] = adjusted_rand_index_cells(spark, SF_DIR).collect()
    assert r["n_points"] == n
    assert r["pair_tp"] == tp
    assert r["pair_same_cluster"] == sa
    assert r["pair_same_label"] == sb
    assert abs(r["ari"] - ari) < 1e-5
    assert abs(r["fowlkes_mallows"] - fm) < 1e-5
    assert abs(r["rand_index"] - ri) < 1e-5
    assert -1.0 <= r["ari"] <= 1.0


def test_bcubed_matches_textbook(spark):
    from zoom_spark.queries.round10c_ops import bcubed_cluster_eval

    ct = _cells_labels_contingency(spark)
    n = sum(ct.values())
    a = {}
    b = {}
    for (c, l), v in ct.items():
        a[c] = a.get(c, 0) + v
        b[l] = b.get(l, 0) + v
    prec = sum(v * v / a[c] for (c, l), v in ct.items()) / n
    rec = sum(v * v / b[l] for (c, l), v in ct.items()) / n
    f1 = 2 * prec * rec / (prec + rec)
    [r] = bcubed_cluster_eval(spark, SF_DIR).collect()
    assert r["n_points"] == n
    assert abs(r["bcubed_precision"] - prec) < 1e-5
    assert abs(r["bcubed_recall"] - rec) < 1e-5
    assert abs(r["bcubed_f1"] - f1) < 1e-5
    assert 0 < r["bcubed_f1"] <= 1.0


def test_vmeasure_matches_textbook(spark):
    from zoom_spark.queries.round10c_ops import vmeasure_nmi_cells

    ct = _cells_labels_contingency(spark)
    n = sum(ct.values())
    a = {}
    b = {}
    for (c, l), v in ct.items():
        a[c] = a.get(c, 0) + v
        b[l] = b.get(l, 0) + v

    def ent(vals):
        return -sum(v / n * math.log(v / n) for v in vals if v > 0)

    hc, hl, hcl = ent(a.values()), ent(b.values()), ent(ct.values())
    mi = hc + hl - hcl
    [r] = vmeasure_nmi_cells(spark, SF_DIR).collect()
    assert r["n_points"] == n
    assert abs(r["h_cluster"] - hc) < 1e-5
    assert abs(r["h_label"] - hl) < 1e-5
    assert abs(r["mutual_info"] - mi) < 1e-5
    assert abs(r["homogeneity"] - mi / hl) < 1e-4
    assert abs(r["completeness"] - mi / hc) < 1e-4
    assert abs(r["v_measure"] - 2 * mi / (hc + hl)) < 1e-4
    assert abs(r["nmi"] - mi / math.sqrt(hc * hl)) < 1e-4
    assert 0 <= r["v_measure"] <= 1.0 + 1e-9


def test_greedy_max_coverage_matches_python(spark):
    import re

    from zoom_spark.queries.round10c_ops import greedy_max_coverage_docs

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).toPandas()
    postings = {}
    for _, r in docs.iterrows():
        toks = [t for t in re.split(r"\s+", r["text"].strip().lower()) if t]
        if len(toks) < 2:
            continue
        postings[r["doc_id"]] = {
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        }
    vocab = set().union(*postings.values())
    covered = set()
    expected = []
    for _ in range(10):
        best = None
        for d, ts in sorted(postings.items()):
            gain = len(ts - covered)
            if best is None or gain > best[1]:
                best = (d, gain)
        covered |= postings[best[0]]
        expected.append((best[0], best[1], len(covered)))
    rows = greedy_max_coverage_docs(spark, SF_DIR).collect()
    assert len(rows) == 10
    for i, (r, (d, g, cum)) in enumerate(zip(rows, expected)):
        assert r["round"] == i
        assert r["doc_id"] == d
        assert r["new_terms"] == g
        assert r["cumulative_terms"] == cum
        assert abs(r["coverage_frac"] - cum / len(vocab)) < 1e-6
    # submodularity: marginal gains are nonincreasing
    gains = [r["new_terms"] for r in rows]
    assert all(a >= b for a, b in zip(gains, gains[1:]))


def test_kcenter_greedy_matches_python(spark):
    import hashlib

    from zoom_spark.queries.round10c_ops import kcenter_greedy_embeddings

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    ).toPandas()
    q = 1_000_000
    vecs = {
        int(r["vec_id"]): np.floor(
            np.asarray(r["embedding"], dtype=np.float64) * q + 0.5
        ).astype(np.int64)
        for _, r in emb.iterrows()
    }
    start = min(
        vecs, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )
    selected = [start]
    md2 = {
        v: int(((vecs[v] - vecs[start]) ** 2).sum()) for v in vecs
    }
    for _ in range(7):
        far = max(md2, key=lambda v: (md2[v], -v))
        # tie-break: max distance, then LOWEST vec_id
        best = min(
            (v for v in md2 if md2[v] == md2[far])
        )
        selected.append(best)
        for v in vecs:
            md2[v] = min(
                md2[v], int(((vecs[v] - vecs[best]) ** 2).sum())
            )
    radius = math.sqrt(max(md2.values())) / q
    rows = kcenter_greedy_embeddings(spark, SF_DIR).collect()
    assert len(rows) == 8
    assert [r["vec_id"] for r in rows] == selected
    assert all(r["round"] == i for i, r in enumerate(rows))
    assert abs(rows[0]["final_radius"] - radius) < 1e-5


def test_hill_numbers_matches_python(spark):
    import re
    from collections import Counter

    from zoom_spark.queries.round10c_ops import hill_numbers_diversity

    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "text"
    ).toPandas()
    per_src = {}
    for _, r in docs.iterrows():
        toks = [t for t in re.split(r"\s+", r["text"].strip().lower()) if t]
        per_src.setdefault(r["source"], Counter()).update(toks)
    rows = hill_numbers_diversity(spark, SF_DIR).collect()
    assert len(rows) == len(per_src)
    for r in rows:
        cnt = per_src[r["source"]]
        n = sum(cnt.values())
        probs = np.array(list(cnt.values()), dtype=float) / n
        h = float(-(probs * np.log(probs)).sum())
        q0 = len(cnt)
        q1 = math.exp(h)
        q2 = n * n / sum(v * v for v in cnt.values())
        qinf = n / max(cnt.values())
        assert r["hill_q0"] == q0
        assert abs(r["hill_q1"] - q1) < 1e-3
        assert abs(r["hill_q2"] - q2) < 1e-4
        assert abs(r["hill_qinf"] - qinf) < 1e-4
        # Hill numbers are nonincreasing in q
        assert q0 + 1e-9 >= r["hill_q1"] >= r["hill_q2"] - 1e-9
        assert r["hill_q2"] >= r["hill_qinf"] - 1e-9


def test_rarefaction_matches_lgamma(spark):
    import re
    from collections import Counter
    from math import lgamma

    from zoom_spark.queries.round10c_ops import rarefaction_curve_sources

    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "text"
    ).toPandas()
    per_src = {}
    for _, r in docs.iterrows():
        toks = [t for t in re.split(r"\s+", r["text"].strip().lower()) if t]
        per_src.setdefault(r["source"], Counter()).update(toks)

    def lnc(n, k):
        return lgamma(n + 1) - lgamma(k + 1) - lgamma(n - k + 1)

    rows = rarefaction_curve_sources(spark, SF_DIR).collect()
    assert len(rows) == 2 * len(per_src)
    for r in rows:
        cnt = per_src[r["source"]]
        n = sum(cnt.values())
        m = n // 4 if r["m_label"] == "quarter" else n // 2
        es = sum(
            1.0
            if c > n - m
            else 1.0 - math.exp(lnc(n - c, m) - lnc(n, m))
            for c in cnt.values()
        )
        assert r["m"] == m
        assert r["observed_richness"] == len(cnt)
        assert abs(r["expected_richness"] - es) < 5e-3
        # rarefied richness can never exceed the observed richness
        assert r["expected_richness"] <= r["observed_richness"] + 1e-9


def test_rayleigh_circular_matches_numpy(spark):
    from zoom_spark.queries.round10c_ops import rayleigh_circular_hours

    ev = load_table(spark, SF_DIR, "events").select("ts").toPandas()
    sod = (
        ev["ts"].dt.hour * 3600
        + ev["ts"].dt.minute * 60
        + ev["ts"].dt.second
    ).to_numpy()
    theta = sod * 2 * math.pi / 86400.0
    n = len(theta)
    c, s = np.cos(theta).sum(), np.sin(theta).sum()
    rbar = math.hypot(c, s) / n
    z = n * rbar * rbar
    p = math.exp(-z) * (1 + (2 * z - z * z) / (4 * n))
    mean_dir = math.atan2(s, c)
    if mean_dir < 0:
        mean_dir += 2 * math.pi
    mean_hour = mean_dir / (2 * math.pi) * 24
    cstd = math.sqrt(-2 * math.log(rbar)) / (2 * math.pi) * 24
    [r] = rayleigh_circular_hours(spark, SF_DIR).collect()
    assert r["n_events"] == n
    assert abs(r["mean_resultant_r"] - rbar) < 1e-6
    assert abs(r["rayleigh_z"] - z) < 1e-4
    assert abs(r["p_value"] - p) < 1e-5
    assert abs(r["mean_hour"] - mean_hour) < 1e-3
    assert abs(r["circular_std_hours"] - cstd) < 1e-3
    assert 0 <= r["mean_resultant_r"] <= 1
    assert 0 <= r["mean_hour"] < 24

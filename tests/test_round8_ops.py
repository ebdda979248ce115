"""Referees for the round-8 operators (R301-R319): independent
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


def _orders():
    return pd.read_parquet(f"{SF_DIR}/orders.parquet")


def _daily_rev():
    o = _orders()
    d = (
        o.assign(day=pd.to_datetime(o["o_orderdate"]).dt.date)
        .groupby("day")["o_totalprice"]
        .sum()
        .round(2)
        .sort_index()
    )
    return d


def _events():
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    return ev


def _gaps():
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    g = ev.groupby("user_id")["ts"].diff().shift(-1)
    # mirror the engine: lead(ts) - ts within user, in seconds
    out = []
    for _, grp in ev.groupby("user_id"):
        ts = (
            pd.to_datetime(grp["ts"])
            .astype("datetime64[ns]")
            .astype("int64")
            .to_numpy()
            // 1000
        )
        d = np.diff(ts) / 1e6
        out.extend(d[d > 0])
    return np.array(sorted(out))


def test_dagostino_k2_matches_numpy(spark):
    from zoom_spark.queries.round8_ops import dagostino_k2_order_values

    [r] = dagostino_k2_order_values(spark, SF_DIR).collect()
    x = np.round(np.log(_orders()["o_totalprice"].to_numpy()), 6)
    n = len(x)
    g1 = ((x - x.mean()) ** 3).mean() / (((x - x.mean()) ** 2).mean()) ** 1.5
    g2 = ((x - x.mean()) ** 4).mean() / (((x - x.mean()) ** 2).mean()) ** 2 - 3
    assert r["n"] == n
    assert r["skew_g1"] == pytest.approx(g1, abs=1e-4)
    assert r["kurt_g2"] == pytest.approx(g2, abs=1e-4)
    # z transforms: reproduce D'Agostino / Anscombe-Glynn directly
    y = g1 * math.sqrt((n + 1) * (n + 3) / (6.0 * (n - 2)))
    b2 = 3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3) / (
        (n - 2) * (n + 5) * (n + 7) * (n + 9)
    )
    w2 = -1 + math.sqrt(2 * (b2 - 1))
    a = math.sqrt(2.0 / (w2 - 1))
    zs = math.log(y / a + math.sqrt((y / a) ** 2 + 1)) / math.sqrt(
        math.log(math.sqrt(w2))
    )
    assert r["z_skew"] == pytest.approx(zs, abs=1e-3)
    assert r["k2"] == pytest.approx(r["z_skew"] ** 2 + r["z_kurt"] ** 2, abs=1e-4)


def test_anderson_darling_matches_numpy_sorted_form(spark):
    from zoom_spark.queries.round8_ops import anderson_darling_interevent

    [r] = anderson_darling_interevent(spark, SF_DIR).collect()
    x = _gaps()
    n = len(x)
    theta = round(x.mean(), 6)
    f = 1.0 - np.exp(-x / theta)
    i = np.arange(1, n + 1)
    a2 = -n - np.mean((2 * i - 1) * (np.log(f) + np.log(1 - f[::-1])))
    assert r["n_gaps"] == n
    assert r["theta_sec"] == pytest.approx(theta, abs=1e-6)
    assert r["a2"] == pytest.approx(a2, abs=1e-3)


def test_generalized_esd_matches_pandas_loop(spark):
    from zoom_spark.queries.round8_ops import (
        ESD_ROUNDS,
        generalized_esd_revenue,
    )

    rows = sorted(
        generalized_esd_revenue(spark, SF_DIR).collect(),
        key=lambda r: r["iteration"],
    )
    d = _daily_rev().reset_index()
    d.columns = ["day", "rev"]
    for i in range(ESD_ROUNDS):
        mu, sd, n = d["rev"].mean(), d["rev"].std(ddof=1), len(d)
        az = (d["rev"] - mu).abs() / sd
        d2 = d.assign(az=az).sort_values(
            ["az", "day"], ascending=[False, True]
        )
        top = d2.iloc[0]
        r = rows[i]
        assert r["out_day"] == top["day"]
        assert r["out_rev"] == pytest.approx(top["rev"], abs=1e-9)
        assert r["r_stat"] == pytest.approx(top["az"], abs=1e-4)
        assert r["n_remaining"] == n
        d = d[d["day"] != top["day"]]


def test_mood_median_matches_pandas(spark):
    from zoom_spark.queries.round8_ops import mood_median_segments

    rows = mood_median_segments(spark, SF_DIR).collect()
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    x = c["c_acctbal"].round(2)
    med = x.median()
    above = x > med
    got = {r["seg"]: (r["n_above"], r["n_le"]) for r in rows}
    chi2 = 0.0
    ta, tl, n = above.sum(), (~above).sum(), len(x)
    for seg, grp in c.groupby("c_mktsegment"):
        ga = (grp["c_acctbal"].round(2) > med).sum()
        gl = len(grp) - ga
        assert got[seg] == (ga, gl)
        ea, el = len(grp) * ta / n, len(grp) * tl / n
        chi2 += (ga - ea) ** 2 / ea + (gl - el) ** 2 / el
    assert rows[0]["chi2_total"] == pytest.approx(chi2, abs=1e-4)


def test_page_hinkley_matches_pandas_cumsum(spark):
    from zoom_spark.queries.round8_ops import PH_DELTA, page_hinkley_revenue

    [r] = page_hinkley_revenue(spark, SF_DIR).collect()
    d = _daily_rev()
    mu = math.floor(d.mean() * 1e9 + 0.5) / 1e9
    mt = (d - mu - PH_DELTA * mu).cumsum()
    ph = mt - mt.cummin()
    assert r["n_days"] == len(d)
    assert r["ph_max_rel"] == pytest.approx(ph.max() / mu, abs=1e-4)
    assert r["ph_argmax_day"] == ph.idxmax()


def test_kpss_matches_numpy(spark):
    from zoom_spark.queries.round8_ops import KPSS_LAGS, kpss_level_revenue

    [r] = kpss_level_revenue(spark, SF_DIR).collect()
    x = _daily_rev().to_numpy()
    n = len(x)
    e = x - (math.floor(x.mean() * 1e9 + 0.5) / 1e9)
    st = np.cumsum(e)
    gam = [np.sum(e[j:] * e[: n - j]) / n for j in range(KPSS_LAGS + 1)]
    s2 = gam[0] + 2 * sum(
        (1 - j / (KPSS_LAGS + 1.0)) * gam[j] for j in range(1, KPSS_LAGS + 1)
    )
    kpss = np.sum(st**2) / (n * n * s2)
    assert r["n_days"] == n
    assert r["long_run_var_m"] == pytest.approx(s2 / 1e6, rel=1e-6)
    assert r["kpss_stat"] == pytest.approx(kpss, abs=1e-5)


def test_diebold_mariano_matches_numpy(spark):
    from zoom_spark.queries.round8_ops import diebold_mariano_revenue

    [r] = diebold_mariano_revenue(spark, SF_DIR).collect()
    x = _daily_rev().to_numpy()
    e1 = np.abs(x[7:] - x[6:-1])
    e2 = np.abs(x[7:] - x[:-7])
    dt = e1 - e2
    n = len(dt)
    dbar = dt.mean()
    vd = (dt * dt).mean() - dbar * dbar
    assert r["n_days"] == n
    assert r["mean_loss_diff"] == pytest.approx(dbar, abs=1e-3)
    assert r["dm_stat"] == pytest.approx(dbar / math.sqrt(vd / n), abs=1e-4)


def test_pinball_loss_matches_numpy_quantiles(spark):
    from zoom_spark.queries.round8_ops import (
        PINBALL_QS,
        PINBALL_SPLIT,
        pinball_loss_weekday_quantiles,
    )

    rows = {
        round(r["tau"], 2): r
        for r in pinball_loss_weekday_quantiles(spark, SF_DIR).collect()
    }
    d = _daily_rev().reset_index()
    d.columns = ["day", "rev"]
    anchor = pd.Timestamp("1990-01-01").date()
    d["dow"] = [(dy - anchor).days % 7 for dy in d["day"]]
    split = pd.Timestamp(PINBALL_SPLIT).date()
    train, test = d[d["day"] < split], d[d["day"] >= split]
    for tau in PINBALL_QS:
        q = train.groupby("dow")["rev"].quantile(tau, interpolation="linear")
        t = test.assign(q=test["dow"].map(q))
        loss = np.where(
            t["rev"] >= t["q"],
            tau * (t["rev"] - t["q"]),
            (tau - 1.0) * (t["rev"] - t["q"]),
        )
        r = rows[round(tau, 2)]
        assert r["n_test_days"] == len(test)
        assert r["pinball"] == pytest.approx(loss.mean(), abs=1e-2)


def test_iv_2sls_matches_numpy_wald(spark):
    from zoom_spark.queries.round8_ops import iv_2sls_orders_revenue

    [r] = iv_2sls_orders_revenue(spark, SF_DIR).collect()
    o = _orders()
    o["day"] = pd.to_datetime(o["o_orderdate"]).dt.date
    anchor = pd.Timestamp("1990-01-01").date()
    d = o.groupby("day").agg(
        x=("o_orderkey", "count"), y=("o_totalprice", "sum")
    )
    d["y"] = d["y"].round(2)
    d["z"] = [(dy - anchor).days % 7 in (5, 6) for dy in d.index]
    z, x, y = (
        d["z"].astype(float).to_numpy(),
        d["x"].astype(float).to_numpy(),
        d["y"].to_numpy(),
    )
    czy = np.mean(z * y) - z.mean() * y.mean()
    czx = np.mean(z * x) - z.mean() * x.mean()
    beta = czy / czx
    assert r["n_days"] == len(d)
    # relative tolerance: the engine snaps the moment inputs to the
    # 9dp grid, and with a weak instrument (czx near 0 on uniform
    # TPC-H dates) the ratio amplifies that snap
    assert r["beta_iv"] == pytest.approx(beta, rel=1e-5)
    assert r["alpha_iv"] == pytest.approx(
        y.mean() - beta * x.mean(), rel=1e-5
    )
    # weak-instrument diagnostic must be a valid R^2 (and on uniform
    # dates it SHOULD scream "weak")
    assert 0.0 <= r["first_stage_r2"] <= 1.0


def test_rdd_matches_numpy_side_fits(spark):
    from zoom_spark.queries.round8_ops import (
        RDD_BANDWIDTH,
        RDD_CUTOFF,
        regression_discontinuity_acctbal,
    )

    [r] = regression_discontinuity_acctbal(spark, SF_DIR).collect()
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    o = _orders()
    y = o.groupby("o_custkey")["o_totalprice"].sum().round(2)
    df = c.assign(y=c["c_custkey"].map(y)).dropna(subset=["y"])
    df["r"] = df["c_acctbal"].round(2) - RDD_CUTOFF
    df = df[df["r"].abs() <= RDD_BANDWIDTH]
    fits = {}
    for side, grp in df.groupby((df["r"] >= 0).astype(int)):
        slope, icept = np.polyfit(grp["r"], grp["y"], 1)
        fits[side] = (icept, slope, len(grp))
    assert r["n_left"] == fits[0][2] and r["n_right"] == fits[1][2]
    assert r["intercept_left"] == pytest.approx(fits[0][0], abs=1e-1)
    assert r["intercept_right"] == pytest.approx(fits[1][0], abs=1e-1)
    assert r["slope_left"] == pytest.approx(fits[0][1], abs=1e-3)
    assert r["rd_effect"] == pytest.approx(
        fits[1][0] - fits[0][0], abs=2e-1
    )


def test_weibull_fit_matches_numpy_regression(spark):
    from zoom_spark.queries.round8_ops import weibull_fit_interevent

    [r] = weibull_fit_interevent(spark, SF_DIR).collect()
    x = _gaps()
    n = len(x)
    # Bernard median rank at each tie block's LAST position
    s = pd.Series(x)
    cnt = s.value_counts().sort_index()
    cum = cnt.cumsum()
    lx = np.log(cnt.index.to_numpy())
    ly = np.log(-np.log(1.0 - (cum.to_numpy() - 0.3) / (n + 0.4)))
    w = cnt.to_numpy().astype(float)
    mx = np.average(lx, weights=w)
    my = np.average(ly, weights=w)
    cxy = np.average(lx * ly, weights=w) - mx * my
    vx = np.average(lx * lx, weights=w) - mx * mx
    k = cxy / vx
    lam = math.exp(-(my - k * mx) / k)
    assert r["n_gaps"] == n
    assert r["shape_k"] == pytest.approx(k, abs=1e-4)
    assert r["scale_lambda"] == pytest.approx(lam, rel=1e-4)
    # gaps of a bursty event stream: shape below 1.5 sanity band
    assert 0.05 < r["shape_k"] < 3.0


def test_woe_iv_matches_pandas(spark):
    from zoom_spark.queries.round8_ops import WOE_BINS, woe_iv_acctbal

    rows = {r["bin"]: r for r in woe_iv_acctbal(spark, SF_DIR).collect()}
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    o = _orders()
    urgent = o[o["o_orderpriority"] == "1-URGENT"].groupby("o_custkey").size()
    lab = c.assign(
        bal=c["c_acctbal"].round(2),
        y=c["c_custkey"].isin(urgent.index).astype(int),
    ).sort_values(["bal", "c_custkey"])
    n = len(lab)
    lab["bin"] = (np.arange(n) * WOE_BINS) // n
    tp, tn = lab["y"].sum(), (1 - lab["y"]).sum()
    iv_total = 0.0
    for b, grp in lab.groupby("bin"):
        pos, neg = grp["y"].sum(), len(grp) - grp["y"].sum()
        woe = math.log(((pos + 0.5) * (tn + 0.5)) / ((neg + 0.5) * (tp + 0.5)))
        ivc = ((pos + 0.5) / (tp + 0.5) - (neg + 0.5) / (tn + 0.5)) * woe
        iv_total += ivc
        assert rows[b]["n_pos"] == pos and rows[b]["n_neg"] == neg
        assert rows[b]["woe"] == pytest.approx(woe, abs=1e-5)
    assert rows[0]["iv_total"] == pytest.approx(iv_total, abs=1e-5)


def test_srm_check_counts(spark):
    from zoom_spark.queries.round8_ops import SRM_ARMS, srm_check_assignment

    rows = srm_check_assignment(spark, SF_DIR).collect()
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    arms = (c["c_custkey"] % SRM_ARMS).value_counts()
    got = {r["arm"]: r["n"] for r in rows}
    assert got == {int(k): int(v) for k, v in arms.items()}
    t = len(c)
    chi2 = sum(
        (v - t / SRM_ARMS) ** 2 / (t / SRM_ARMS) for v in arms.to_numpy()
    )
    assert rows[0]["chi2_srm"] == pytest.approx(chi2, abs=1e-5)


def test_somers_d_matches_bruteforce_pairs(spark):
    from zoom_spark.queries.round8_ops import (
        SOMERS_BINS,
        somers_d_balance_urgency,
    )

    [r] = somers_d_balance_urgency(spark, SF_DIR).collect()
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    o = _orders()
    urgent = set(o[o["o_orderpriority"] == "1-URGENT"]["o_custkey"])
    xb = np.minimum(
        np.maximum(
            np.floor((c["c_acctbal"].round(2) + 1000.0) / 1375.0), 0
        ),
        SOMERS_BINS - 1,
    ).astype(int).to_numpy()
    y = c["c_custkey"].isin(urgent).astype(int).to_numpy()
    conc = disc = px = 0
    n = len(xb)
    for i in range(n):
        dx = xb - xb[i]
        dy = y - y[i]
        conc += int(np.sum((dx > 0) & (dy > 0)) + np.sum((dx < 0) & (dy < 0)))
        disc += int(np.sum((dx > 0) & (dy < 0)) + np.sum((dx < 0) & (dy > 0)))
        px += int(np.sum(dx != 0))
    assert r["n_customers"] == n
    assert r["concordant"] == conc // 2
    assert r["discordant"] == disc // 2
    assert r["somers_d"] == pytest.approx((conc - disc) / px, abs=1e-6)
    # non-vacuous: both pair kinds exist
    assert conc > 0 and disc > 0


def _weekend_values():
    ev = _events()
    anchor = pd.Timestamp("2024-01-01").date()
    days = pd.to_datetime(ev["ts"]).dt.date
    grp = np.array([(d - anchor).days % 7 in (5, 6) for d in days]).astype(int)
    return ev["value"].to_numpy(), grp


def test_ansari_bradley_matches_bruteforce_scores(spark):
    from zoom_spark.queries.round8_ops import ansari_bradley_weekend

    [r] = ansari_bradley_weekend(spark, SF_DIR).collect()
    v, grp = _weekend_values()
    order = np.argsort(v, kind="stable")
    n = len(v)
    # per-position scores, then average within tie blocks
    pos_score = np.minimum(np.arange(1, n + 1), n + 1 - np.arange(1, n + 1))
    vs = v[order]
    s_avg = np.empty(n)
    i = 0
    while i < n:
        j = i
        while j < n and vs[j] == vs[i]:
            j += 1
        s_avg[i:j] = pos_score[i:j].mean()
        i = j
    scores = np.empty(n)
    scores[order] = s_avg
    t1 = scores[grp == 1].sum()
    n1, n2 = int((grp == 1).sum()), int((grp == 0).sum())
    st, st2 = scores.sum(), (scores**2).sum()
    e_t = n1 * st / n
    var_t = n1 * n2 * (st2 - st * st / n) / (n * (n - 1.0))
    assert r["n_weekend"] == n1 and r["n_weekday"] == n2
    assert r["ab_stat"] == pytest.approx(t1, abs=0.11)
    assert r["z"] == pytest.approx((t1 - e_t) / math.sqrt(var_t), abs=1e-4)


def test_conover_squared_ranks_matches_bruteforce(spark):
    from zoom_spark.queries.round8_ops import conover_squared_ranks_weekend

    [r] = conover_squared_ranks_weekend(spark, SF_DIR).collect()
    v, grp = _weekend_values()
    mu = {
        g: math.floor(v[grp == g].mean() * 1e9 + 0.5) / 1e9 for g in (0, 1)
    }
    u = np.abs(v - np.where(grp == 1, mu[1], mu[0]))
    ranks = pd.Series(u).rank(method="average").to_numpy()
    scores = ranks**2
    t1 = scores[grp == 1].sum()
    n1, n2, n = int((grp == 1).sum()), int((grp == 0).sum()), len(v)
    st, st2 = scores.sum(), (scores**2).sum()
    e_t = n1 * st / n
    var_t = n1 * n2 * (st2 - st * st / n) / (n * (n - 1.0))
    assert r["n_weekend"] == n1 and r["n_weekday"] == n2
    assert r["t_stat"] == pytest.approx(t1, rel=1e-9)
    assert r["z"] == pytest.approx((t1 - e_t) / math.sqrt(var_t), abs=1e-4)


def test_burrows_delta_matches_pandas(spark):
    from zoom_spark.queries.round8_ops import (
        DELTA_TOP_WORDS,
        burrows_delta_sources,
    )

    rows = {
        (r["source_a"], r["source_b"]): r["delta"]
        for r in burrows_delta_sources(spark, SF_DIR).collect()
    }
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    from collections import Counter

    per_src: dict = {}
    corpus: Counter = Counter()
    for _, row in docs.iterrows():
        toks = [t for t in row["text"].lower().strip().split() if t]
        per_src.setdefault(row["source"], Counter()).update(toks)
        corpus.update(toks)
    topw = sorted(corpus, key=lambda w: (-corpus[w], w))[:DELTA_TOP_WORDS]
    srcs = sorted(per_src)
    freq = pd.DataFrame(
        {
            s: [per_src[s][w] / sum(per_src[s].values()) for w in topw]
            for s in srcs
        },
        index=topw,
    )
    mu = freq.mean(axis=1).apply(lambda x: math.floor(x * 1e9 + 0.5) / 1e9)
    sd = freq.std(axis=1, ddof=1).apply(
        lambda x: math.floor(x * 1e9 + 0.5) / 1e9
    )
    keep = sd > 0
    z = freq[keep.to_numpy()].sub(mu[keep], axis=0).div(sd[keep], axis=0)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            expect = (z[a] - z[b]).abs().mean()
            assert rows[(a, b)] == pytest.approx(expect, abs=1e-5), (a, b)


def test_t_closeness_matches_pandas_emd(spark):
    from zoom_spark.queries.round8_ops import TCLOSE_BUCKETS, t_closeness_report

    rows = {
        (r["nationkey"], r["mktsegment"]): r
        for r in t_closeness_report(spark, SF_DIR).collect()
    }
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    b = np.minimum(
        np.floor((c["c_acctbal"].round(2) + 1000.0) / 2500.0),
        TCLOSE_BUCKETS - 1,
    ).astype(int)
    df = pd.DataFrame(
        {"nat": c["c_nationkey"], "seg": c["c_mktsegment"], "b": b}
    )
    glob = df["b"].value_counts(normalize=True).reindex(
        range(TCLOSE_BUCKETS), fill_value=0.0
    )
    for (nat, seg), grp in df.groupby(["nat", "seg"]):
        p = grp["b"].value_counts(normalize=True).reindex(
            range(TCLOSE_BUCKETS), fill_value=0.0
        )
        cd = (p - glob).cumsum().to_numpy()[: TCLOSE_BUCKETS - 1]
        emd = np.abs(cd).sum() / (TCLOSE_BUCKETS - 1)
        r = rows[(nat, seg)]
        assert r["group_size"] == len(grp)
        assert r["t_emd"] == pytest.approx(emd, abs=1e-5)


def test_harmonic_centrality_matches_python_bfs(spark):
    from zoom_spark.queries.round8_ops import (
        HC_HOPS,
        HC_SEEDS,
        harmonic_centrality_parts,
    )

    rows = {
        r["node"]: (r["n_seeds_reached"], r["harmonic"])
        for r in harmonic_centrality_parts(spark, SF_DIR).collect()
    }
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    from collections import deque
    from itertools import combinations

    adj: dict = {}
    for _, grp in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(grp["l_partkey"].unique()), 2):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    seeds = sorted(adj)[:HC_SEEDS]
    harm: dict = {}
    reach: dict = {}
    for s in seeds:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= HC_HOPS:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        for node, dd in dist.items():
            if dd > 0:
                harm[node] = harm.get(node, 0.0) + 1.0 / dd
                reach[node] = reach.get(node, 0) + 1
    # seeds reached from other seeds appear too
    assert set(rows) == set(harm)
    for node, (nr, h) in rows.items():
        assert nr == reach[node]
        assert h == pytest.approx(harm[node], abs=1e-5)


def test_knn_sq8_matches_numpy_quantization(spark):
    """SQ8 referee: numpy re-derivation of the per-dim affine codes,
    integer candidate distances, and float-cosine rerank; plus a
    recall@k check against exact brute-force cosine."""
    from zoom_spark.queries.round8_ops import (
        SQ8_CAND,
        SQ8_K,
        SQ8_QUERIES,
        knn_sq8_rerank,
    )

    rows = knn_sq8_rerank(spark, SF_DIR).collect()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    lo, hi = V.min(axis=0), V.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    Q = np.clip(np.floor((V - lo) / span * 255.0 + 0.5), 0, 255).astype(
        np.int64
    )
    got = {}
    for r in rows:
        got.setdefault(r["q_id"], []).append(
            (r["rnk"], r["neighbor_id"], r["cosine_sim"])
        )
    norm = np.sqrt((V * V).sum(axis=1))
    exact_hits = 0
    for qi in np.where(ids < SQ8_QUERIES)[0]:
        d2 = ((Q - Q[qi]) ** 2).sum(axis=1)
        order = sorted(
            [(int(d2[j]), int(ids[j])) for j in range(len(ids)) if j != qi]
        )
        cand = [nid for _, nid in order[:SQ8_CAND]]
        cos = {
            int(ids[j]): round(
                float(V[qi] @ V[j] / (norm[qi] * norm[j])), 6
            )
            for j in range(len(ids))
            if int(ids[j]) in cand
        }
        top = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:SQ8_K]
        expect = [(i + 1, nid, c) for i, (nid, c) in enumerate(top)]
        g = sorted(got[int(ids[qi])])
        assert [(r, n) for r, n, _ in g] == [(r, n) for r, n, _ in expect]
        for (_, _, gc), (_, _, ec) in zip(g, expect):
            assert gc == pytest.approx(ec, abs=2e-6)
        # recall@1 vs exact float brute force
        allcos = {
            int(ids[j]): float(V[qi] @ V[j] / (norm[qi] * norm[j]))
            for j in range(len(ids))
            if j != qi
        }
        best = max(allcos.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        exact_hits += int(g[0][1] == best)
    # SQ8 with 20-candidate rerank should recover the true top-1 for
    # the vast majority of queries on this fixture
    assert exact_hits >= int(0.8 * SQ8_QUERIES)


def test_bh_fdr_matches_numpy_stepup(spark):
    from zoom_spark.queries.round8_ops import bh_fdr_nation_urgency

    rows = bh_fdr_nation_urgency(spark, SF_DIR).collect()
    k = len(rows)
    byrank = sorted(rows, key=lambda r: r["p_rank"])
    # monotone step-up: q non-decreasing in rank, q >= p, q <= 1
    qs = [r["bh_q"] for r in byrank]
    assert all(qs[i] <= qs[i + 1] + 1e-12 for i in range(k - 1))
    for r in byrank:
        assert r["p_value"] <= r["bh_q"] + 1e-12
        assert r["bh_q"] <= 1.0
    # numpy referee: recompute q from the reported p-values
    ps = np.array([r["p_value"] for r in byrank])
    q = np.minimum.accumulate((ps * k / np.arange(1, k + 1))[::-1])[::-1]
    q = np.minimum(q, 1.0)
    for r, expect in zip(byrank, q):
        assert r["bh_q"] == pytest.approx(expect, abs=1e-9)
    # counts referee on one nation
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    o = _orders()
    n = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    grp = j.groupby("n_name")
    got = {r["nation"]: (r["n_urgent"], r["n_orders"]) for r in rows}
    for name, g in grp:
        assert got[name] == (
            int((g["o_orderpriority"] == "1-URGENT").sum()),
            len(g),
        )


def _py_soundex(word: str) -> str:
    """Textbook American Soundex (positional algorithm — an
    independent spelling from the engine's translate/collapse chain):
    keep first letter; code the rest with H/W transparent for
    adjacent-merge and vowels breaking merges."""
    codes = {
        **{c: "1" for c in "BFPV"},
        **{c: "2" for c in "CGJKQSXZ"},
        **{c: "3" for c in "DT"},
        "L": "4",
        **{c: "5" for c in "MN"},
        "R": "6",
    }
    w = word.upper()
    out = []
    prev = codes.get(w[0], "")
    for ch in w[1:]:
        if ch in "HW":
            continue  # transparent: does not reset prev
        code = codes.get(ch, "")
        if code == "":  # vowel: breaks merges
            prev = ""
            continue
        if code != prev:
            out.append(code)
        prev = code
    return w[0] + ("".join(out) + "000")[:3]


def test_soundex_blocked_dedup_matches_python(spark):
    from zoom_spark.queries.round8_ops import (
        SDX_LEV_MAX,
        soundex_blocked_dedup,
    )

    rows = soundex_blocked_dedup(spark, SF_DIR).collect()
    p = pd.read_parquet(f"{SF_DIR}/part.parquet")
    p["tok"] = p["p_name"].str.split(" ").str[0].str.upper()
    p["code"] = p["tok"].map(_py_soundex)
    import itertools

    def lev(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = min(
                    dp[j] + 1,
                    dp[j - 1] + 1,
                    prev + (a[i - 1] != b[j - 1]),
                )
                prev = cur
        return dp[n]

    expect = set()
    for (code, size), grp in p.groupby(["code", "p_size"]):
        recs = sorted(zip(grp["p_partkey"], grp["p_name"]))
        for (ka, na), (kb, nb) in itertools.combinations(recs, 2):
            d = lev(na, nb)
            if d <= SDX_LEV_MAX:
                expect.add((code, int(size), int(ka), int(kb), d))
    got = {
        (r["sdx_block"], r["p_size"], r["key_a"], r["key_b"], r["lev"])
        for r in rows
    }
    assert got == expect
    assert expect, "fixture should contain phonetic near-dup pairs"


def test_rrf_fusion_matches_pandas(spark):
    from zoom_spark.queries.round8_ops import (
        RRF_K,
        RRF_TERMS,
        RRF_TOP,
        rrf_fusion_ranking,
    )

    rows = rrf_fusion_ranking(spark, SF_DIR).collect()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    from collections import Counter

    tfs, dlen = {}, {}
    for _, row in docs.iterrows():
        toks = [t for t in row["text"].lower().strip().split() if t]
        dlen[row["doc_id"]] = len(toks)
        c = Counter(t for t in toks if t in RRF_TERMS)
        if c:
            tfs[row["doc_id"]] = c
    n_docs = len(dlen)
    avgdl = sum(dlen.values()) / n_docs
    df = Counter()
    for c in tfs.values():
        df.update(c.keys())
    scored = {}
    for d, c in tfs.items():
        bm = sum(
            math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dlen[d] / avgdl))
            for t, tf in c.items()
        )
        ti = sum(tf * math.log(n_docs / df[t]) for t, tf in c.items())
        scored[d] = (round(bm, 4), round(ti, 4))
    rank_bm = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(scored.items(), key=lambda kv: (-kv[1][0], kv[0]))
        )
    }
    rank_ti = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(scored.items(), key=lambda kv: (-kv[1][1], kv[0]))
        )
    }
    rrf = {
        d: 1.0 / (RRF_K + rank_bm[d]) + 1.0 / (RRF_K + rank_ti[d])
        for d in scored
    }
    top = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:RRF_TOP]
    got = sorted(rows, key=lambda r: r["rnk"])
    assert [r["doc_id"] for r in got] == [d for d, _ in top]
    for r in got:
        assert r["rank_bm25"] == rank_bm[r["doc_id"]]
        assert r["rank_tfidf"] == rank_ti[r["doc_id"]]
        assert r["rrf"] == pytest.approx(rrf[r["doc_id"]], abs=1e-9)
    # fusion is non-trivial: the two rankers genuinely disagree
    assert any(rank_bm[d] != rank_ti[d] for d in scored)


def test_jonckheere_terpstra_matches_bruteforce(spark):
    from zoom_spark.queries.round8_ops import (
        JT_BINS,
        jonckheere_terpstra_balance_orders,
    )

    [r] = jonckheere_terpstra_balance_orders(spark, SF_DIR).collect()
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    o = _orders()
    cnt = o.groupby("o_custkey").size()
    g = np.minimum(
        np.maximum(
            np.floor((c["c_acctbal"].round(2) + 1000.0) / 1375.0), 0
        ),
        JT_BINS - 1,
    ).astype(int).to_numpy()
    x = c["c_custkey"].map(cnt).fillna(0).astype(int).to_numpy()
    n = len(x)
    jt = 0.0
    for i in range(n):
        gt = g > g[i]
        jt += np.sum(gt & (x > x[i])) + 0.5 * np.sum(gt & (x == x[i]))
    ng = pd.Series(g).value_counts().to_numpy().astype(float)
    tt = pd.Series(x).value_counts().to_numpy().astype(float)
    N = float(n)
    e = (N * N - np.sum(ng**2)) / 4.0
    v = (
        (N * (N - 1) * (2 * N + 5)
         - np.sum(ng * (ng - 1) * (2 * ng + 5))
         - np.sum(tt * (tt - 1) * (2 * tt + 5))) / 72.0
        + np.sum(ng * (ng - 1) * (ng - 2))
        * np.sum(tt * (tt - 1) * (tt - 2))
        / (36.0 * N * (N - 1) * (N - 2))
        + np.sum(ng * (ng - 1)) * np.sum(tt * (tt - 1))
        / (8.0 * N * (N - 1))
    )
    assert r["jt_stat"] == pytest.approx(jt, abs=0.11)
    assert r["jt_expected"] == pytest.approx(e, abs=0.11)
    assert r["z"] == pytest.approx((jt - e) / math.sqrt(v), abs=1e-4)


def test_brunner_munzel_matches_bruteforce(spark):
    """Per-row midrank recompute (pandas rank average), the scipy
    brunnermunzel formulation."""
    from zoom_spark.queries.round8_ops import brunner_munzel_weekend

    [r] = brunner_munzel_weekend(spark, SF_DIR).collect()
    v, grp = _weekend_values()
    s = pd.Series(v)
    rp = s.rank(method="average").to_numpy()
    m_, n_ = int((grp == 1).sum()), int((grp == 0).sum())
    ra = pd.Series(v[grp == 1]).rank(method="average").to_numpy()
    rb = pd.Series(v[grp == 0]).rank(method="average").to_numpy()
    rpa, rpb = rp[grp == 1], rp[grp == 0]
    rbar_a, rbar_b = rpa.mean(), rpb.mean()
    s2a = np.sum((rpa - ra - rbar_a + (m_ + 1) / 2.0) ** 2) / (m_ - 1)
    s2b = np.sum((rpb - rb - rbar_b + (n_ + 1) / 2.0) ** 2) / (n_ - 1)
    bm = (
        m_ * n_ * (rbar_b - rbar_a) / (m_ + n_)
        / math.sqrt(m_ * s2a + n_ * s2b)
    )
    p_hat = (rbar_b - (n_ + 1) / 2.0) / m_
    assert r["n_weekend"] == m_ and r["n_weekday"] == n_
    assert r["p_hat"] == pytest.approx(p_hat, abs=1e-6)
    assert r["bm_stat"] == pytest.approx(bm, abs=1e-5)
    assert 0.0 <= r["p_hat"] <= 1.0


def test_cucconi_matches_bruteforce(spark):
    from zoom_spark.queries.round8_ops import cucconi_test_weekend

    [r] = cucconi_test_weekend(spark, SF_DIR).collect()
    v, grp = _weekend_values()
    mr = pd.Series(v).rank(method="average").to_numpy()
    n = len(v)
    n1, n2 = int((grp == 1).sum()), int((grp == 0).sum())
    u = np.sum(mr[grp == 1] ** 2)
    vv = np.sum((n - mr[grp == 1] + 1) ** 2)
    eu = n1 * (n + 1) * (2 * n + 1) / 6.0
    vu = n1 * n2 * (n + 1) * (2 * n + 1) * (8 * n + 11) / 180.0
    zu, zv = (u - eu) / math.sqrt(vu), (vv - eu) / math.sqrt(vu)
    rho = 2.0 * (n * n - 4.0) / ((2 * n + 1.0) * (8 * n + 11.0)) - 1.0
    c = (zu**2 + zv**2 - 2 * rho * zu * zv) / (2 * (1 - rho**2))
    assert r["n_weekend"] == n1 and r["n_weekday"] == n2
    assert r["z_u"] == pytest.approx(zu, abs=1e-5)
    assert r["z_v"] == pytest.approx(zv, abs=1e-5)
    assert r["cucconi_c"] == pytest.approx(c, abs=1e-4)
    assert r["cucconi_c"] >= 0.0

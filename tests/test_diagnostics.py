"""Independent referees for the R211-R214 diagnostics operators.

Each test recomputes the statistic with numpy/pandas on the raw
parquet — never through the engine's own plan — and mirrors the
engine's documented rounding schedule (scaled column, rounded mean,
rounded moments) so the comparison is exact, not approximate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR
from zoom_spark.io import load_table

pytestmark = pytest.mark.usefixtures("spark")


def _orders():
    return pd.read_parquet(f"{SF_DIR}/orders.parquet")


def test_jarque_bera_matches_numpy_referee(spark):
    from zoom_spark.queries.diagnostics import (
        _JB_SCALE,
        jarque_bera_order_value,
    )

    [got] = jarque_bera_order_value(spark, SF_DIR).collect()
    v = _orders()["o_totalprice"].to_numpy() * _JB_SCALE
    n = len(v)
    mu = round(v.mean(), 6)
    d = v - mu
    m2 = round((d**2).mean(), 10)
    m3 = round((d**3).mean(), 10)
    m4 = round((d**4).mean(), 10)
    s = m3 / m2**1.5
    k = m4 / m2**2 - 3
    assert got["n"] == n
    assert got["skewness"] == pytest.approx(round(s, 6), abs=2e-6)
    assert got["excess_kurtosis"] == pytest.approx(round(k, 6), abs=2e-6)
    assert got["jb_stat"] == pytest.approx(
        round(n / 6 * (s * s + k * k / 4), 4), abs=1e-2
    )
    # sanity: heavy-skewed synthetic prices must reject normality hard
    assert got["jb_stat"] > 10


def test_bartlett_matches_numpy_referee(spark):
    from zoom_spark.queries.diagnostics import (
        _JB_SCALE,
        bartlett_variance_priorities,
    )

    [got] = bartlett_variance_priorities(spark, SF_DIR).collect()
    o = _orders()
    o["v"] = o["o_totalprice"] * _JB_SCALE
    groups = [g["v"].to_numpy() for _, g in o.groupby("o_orderpriority")]
    k = len(groups)
    n = sum(len(g) for g in groups)
    vis = [round(g.var(ddof=1), 8) for g in groups]
    nis = [len(g) for g in groups]
    sp2 = round(
        sum((ni - 1) * vi for ni, vi in zip(nis, vis)) / (n - k), 8
    )
    num = (n - k) * np.log(sp2) - sum(
        (ni - 1) * np.log(vi) for ni, vi in zip(nis, vis)
    )
    c = 1 + (sum(1 / (ni - 1) for ni in nis) - 1 / (n - k)) / (3 * (k - 1))
    assert got["k"] == k and got["n"] == n
    assert got["bartlett_chi2"] == pytest.approx(
        round(num / c, 6), abs=1e-4
    )


def test_ljung_box_matches_numpy_referee(spark):
    from zoom_spark.queries.diagnostics import (
        _JB_SCALE,
        LB_LAGS,
        ljung_box_daily_revenue,
    )

    rows = ljung_box_daily_revenue(spark, SF_DIR).collect()
    o = _orders()
    day = (
        o.groupby("o_orderdate")["o_totalprice"]
        .sum()
        .sort_index()
        .to_numpy()
    )
    rev = np.round(day * _JB_SCALE, 6)
    n = len(rev)
    mu = round(rev.mean(), 6)
    d = rev - mu
    s0 = round((d * d).sum(), 8)
    rk = {
        k: round(round((d[:-k] * d[k:]).sum(), 8) / s0, 8)
        for k in range(1, LB_LAGS + 1)
    }
    q = round(
        n * (n + 2) * sum(rk[k] ** 2 / (n - k) for k in rk), 6
    )
    got = {r["lag"]: r for r in rows}
    assert set(got) == set(rk)
    for k in rk:
        assert got[k]["autocorr"] == pytest.approx(
            round(rk[k], 6), abs=2e-6
        )
        assert got[k]["q_stat"] == pytest.approx(q, abs=1e-3)


def test_mcc_matches_counting_referee(spark):
    from zoom_spark.queries.diagnostics import (
        MCC_THRESHOLD,
        mcc_value_classifier,
    )

    [got] = mcc_value_classifier(spark, SF_DIR).collect()
    o = _orders()
    pred = (o["o_totalprice"] > MCC_THRESHOLD).to_numpy()
    lab = (o["o_orderpriority"] == "1-URGENT").to_numpy()
    tp = int((pred & lab).sum())
    fp = int((pred & ~lab).sum())
    fn = int((~pred & lab).sum())
    tn = int((~pred & ~lab).sum())
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (tp, fp, fn, tn)
    mcc = (tp * tn - fp * fn) / np.sqrt(
        float(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    sens, spec = tp / (tp + fn), tn / (tn + fp)
    assert got["mcc"] == pytest.approx(round(mcc, 6), abs=1e-9)
    assert got["balanced_accuracy"] == pytest.approx(
        round((sens + spec) / 2, 6), abs=1e-9
    )
    assert got["youden_j"] == pytest.approx(
        round(sens + spec - 1, 6), abs=1e-9
    )
    # all four confusion cells must be populated at every SF
    assert min(tp, fp, fn, tn) > 0


def test_granger_matches_numpy_lstsq_referee(spark):
    """R216 referee: full numpy lstsq on the unrounded day series —
    rounding schedules differ, so compare at a loose-but-binding
    tolerance; the F stat identity is checked from the engine's own
    rounded pieces too."""
    from zoom_spark.queries.diagnostics import (
        _JB_SCALE,
        granger_count_to_revenue,
    )

    [got] = granger_count_to_revenue(spark, SF_DIR).collect()
    o = _orders()
    g = o.groupby("o_orderdate").agg(
        rev=("o_totalprice", "sum"), cnt=("o_totalprice", "size")
    ).sort_index()
    rev = np.round(g["rev"].to_numpy() * _JB_SCALE, 6)
    cnt = g["cnt"].to_numpy().astype(float)
    y, y1, x1 = rev[1:], rev[:-1], cnt[:-1]
    n = len(y)
    assert got["n_pairs"] == n
    Xu = np.column_stack([np.ones(n), y1, x1])
    bu, *_ = np.linalg.lstsq(Xu, y, rcond=None)
    rss_u = float(((y - Xu @ bu) ** 2).sum())
    Xr = np.column_stack([np.ones(n), y1])
    br, *_ = np.linalg.lstsq(Xr, y, rcond=None)
    rss_r = float(((y - Xr @ br) ** 2).sum())
    f = (rss_r - rss_u) * (n - 3) / rss_u
    assert got["beta_revlag"] == pytest.approx(bu[1], abs=1e-3)
    assert got["beta_cntlag"] == pytest.approx(bu[2], abs=1e-3)
    assert got["f_stat"] == pytest.approx(f, rel=5e-3, abs=1e-3)


def test_ridge_matches_numpy_solve_referee(spark):
    from zoom_spark.queries.diagnostics import (
        RIDGE_LAMBDA,
        _RIDGE_YSCALE,
        ridge_lineitem_price_model,
    )

    [got] = ridge_lineitem_price_model(spark, SF_DIR).collect()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    y = li["l_extendedprice"].to_numpy() * _RIDGE_YSCALE
    X = np.column_stack(
        [li["l_quantity"].to_numpy().astype(float), li["l_discount"]]
    )
    Xc = X - X.mean(axis=0)
    yc = y - y.mean()
    G = Xc.T @ Xc
    br = np.linalg.solve(G + RIDGE_LAMBDA * np.eye(2), Xc.T @ yc)
    bo = np.linalg.solve(G, Xc.T @ yc)
    icpt = y.mean() - br @ X.mean(axis=0)
    assert got["n"] == len(y)
    assert got["b_qty_ridge"] == pytest.approx(br[0], abs=1e-4)
    assert got["b_disc_ridge"] == pytest.approx(br[1], abs=1e-3)
    assert got["b_qty_ols"] == pytest.approx(bo[0], abs=1e-4)
    assert got["b_disc_ols"] == pytest.approx(bo[1], abs=1e-3)
    assert got["intercept_ridge"] == pytest.approx(icpt, abs=1e-3)
    # shrinkage direction: ridge coefficients must not exceed OLS in norm
    assert br @ br <= bo @ bo + 1e-12


def test_brier_decomposition_identity_and_referee(spark):
    from zoom_spark.queries.diagnostics import brier_decomposition_purchase

    [got] = brier_decomposition_purchase(spark, SF_DIR).collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["hr"] = pd.to_datetime(ev["ts"]).dt.hour
    ev["o"] = (ev["event_type"] == "purchase").astype(float)
    train = ev[ev["event_id"] % 2 == 0]
    test = ev[ev["event_id"] % 2 == 1].copy()
    fc = train.groupby("hr")["o"].mean().round(6)
    test["fc"] = test["hr"].map(fc)
    assert test["fc"].notna().all()
    n = len(test)
    obar = round(test["o"].mean(), 6)
    brier = round(((test["fc"] - test["o"]) ** 2).mean(), 6)
    bins = test.groupby("hr").agg(
        fck=("fc", "first"), nk=("o", "size"), ok=("o", "mean")
    )
    rel = (bins["nk"] * (bins["fck"] - bins["ok"]) ** 2).sum() / n
    res = (bins["nk"] * (bins["ok"] - obar) ** 2).sum() / n
    unc = obar * (1 - obar)
    assert got["n"] == n
    assert got["obar"] == pytest.approx(obar, abs=1e-9)
    assert got["brier"] == pytest.approx(brier, abs=2e-6)
    assert got["reliability"] == pytest.approx(round(rel, 6), abs=2e-6)
    assert got["resolution"] == pytest.approx(round(res, 6), abs=2e-6)
    assert got["uncertainty"] == pytest.approx(round(unc, 6), abs=1e-9)
    # Murphy identity: brier = rel - res + unc (up to fc-rounding slack)
    assert got["brier"] == pytest.approx(
        got["reliability"] - got["resolution"] + got["uncertainty"],
        abs=5e-4,
    )
    # held-out forecaster: reliability must be strictly positive
    assert got["reliability"] > 0


def test_rolling_30day_distinct_matches_pandas_referee(spark):
    from zoom_spark.queries.diagnostics import (
        RW_DAYS,
        rolling_30day_distinct_users,
    )

    rows = rolling_30day_distinct_users(spark, SF_DIR).collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.normalize()
    got = {r["day"]: r["active_30d"] for r in rows}
    days = sorted(ev["d"].unique())
    assert len(got) == len(days)
    for day in days:
        lo = day - pd.Timedelta(days=RW_DAYS - 1)
        want = ev[(ev["d"] >= lo) & (ev["d"] <= day)]["user_id"].nunique()
        assert got[day.date()] == want
    # window must be binding: the count on the last day differs from
    # the raw per-day distinct count (i.e. this is not a trivial daily)
    last = days[-1]
    daily = ev[ev["d"] == last]["user_id"].nunique()
    assert got[last.date()] > daily


def test_local_clustering_matches_bruteforce_referee(spark):
    """R220 referee: pure-Python adjacency-set triangle counting on
    the co-purchase graph (itertools over sorted neighbor sets)."""
    from itertools import combinations

    from zoom_spark.queries.advanced_analytics import (
        local_clustering_parts,
    )

    rows = local_clustering_parts(spark, SF_DIR).collect()
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    adj: dict[int, set[int]] = {}
    for _, grp in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(grp["l_partkey"].unique()), 2):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    got = {r["node"]: r for r in rows}
    want_nodes = {n for n, s in adj.items() if len(s) >= 2}
    assert set(got) == want_nodes
    import random

    rng = random.Random(7)
    sample = rng.sample(sorted(want_nodes), min(200, len(want_nodes)))
    for n in sample:
        nbrs = adj[n]
        tri = sum(
            1 for a, b in combinations(sorted(nbrs), 2) if b in adj[a]
        )
        d = len(nbrs)
        assert got[n]["deg"] == d
        assert got[n]["tri"] == tri
        assert got[n]["lcc"] == pytest.approx(
            round(2 * tri / (d * (d - 1)), 6), abs=1e-9
        )
    # graph must be non-degenerate: some node has lcc strictly inside (0,1)
    assert any(0 < r["lcc"] < 1 for r in rows)


def test_time_travel_asof_matches_dict_replay_referee(spark):
    """R221 referee: replay the same change log imperatively with a
    dict (last-writer-wins), assert exact state equality at v2 and
    that v3 updates are excluded."""
    from zoom_spark.queries.warehouse_ops import time_travel_asof_orders

    rows = time_travel_asof_orders(spark, SF_DIR).collect()
    o = _orders()
    state: dict[int, tuple] = {}
    for _, r in o.iterrows():
        state[r["o_orderkey"]] = (r["o_totalprice"], r["o_orderstatus"])
    for _, r in o.iterrows():  # version 2, seq 1: updates
        if r["o_orderkey"] % 100 == 0:
            state[r["o_orderkey"]] = (
                round(r["o_totalprice"] * 1.1, 2),
                r["o_orderstatus"],
            )
    for _, r in o.iterrows():  # version 2, seq 2: deletes
        if r["o_orderkey"] % 97 == 0:
            state.pop(r["o_orderkey"], None)
    got = {r["o_orderkey"]: (r["price"], r["status"]) for r in rows}
    assert len(got) == len(state)
    assert got == {
        k: (pytest.approx(v[0], abs=1e-9), v[1]) for k, v in state.items()
    }
    # v3's 0.8x reprice must NOT appear: keys %50==0 (and not deleted,
    # not %100) must still carry their base price
    probe = [
        k for k in state if k % 50 == 0 and k % 100 != 0 and k % 97 != 0
    ]
    assert probe, "fixture must contain v3-only keys"
    base = dict(zip(o["o_orderkey"], o["o_totalprice"]))
    for k in probe[:50]:
        assert got[k][0] == pytest.approx(base[k], abs=1e-9)


def test_frequent_directions_error_bound_and_merge(spark):
    """FD referee: exact numpy Gram of the full embedding matrix —
    the sketch must satisfy the FD spectral bound
    ||A'A - B'B||_2 <= ||A||_F^2 / ell, per-direction lower bounds
    sigma_i(B)^2 >= sigma_i(A)^2 - ||A||_F^2/ell, and the distributed
    (partitioned+merged) sketch must obey the same bound as a
    single-pass sketch (the merge theorem)."""
    from zoom_spark.queries.similarity_queries import (
        frequent_directions_spectrum,
    )
    from zoom_spark.similarity.fd import fd_reduce, fd_sketch

    ELL = 16
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    A = np.stack(
        emb.sort_values("vec_id")["embedding"].to_numpy()
    ).astype(np.float64)
    fro2 = float((A * A).sum())
    bound = fro2 / ELL

    B = fd_sketch(
        load_table(spark, SF_DIR, "embeddings"),
        "embedding",
        "vec_id",
        ell=ELL,
        n_groups=8,
    )
    assert B.shape[1] == A.shape[1]
    gap = np.linalg.norm(A.T @ A - B.T @ B, ord=2)
    assert gap <= bound + 1e-6
    sa = np.linalg.svd(A, compute_uv=False)
    sb = np.linalg.svd(B, compute_uv=False)
    for i in range(min(len(sb), 8)):
        assert sb[i] ** 2 >= sa[i] ** 2 - bound - 1e-6
        assert sb[i] <= sa[i] + 1e-6  # shrinkage never inflates
    # single-pass (unpartitioned) FD obeys the same bound — merging
    # did not break the guarantee
    B1 = fd_reduce(A, ELL)
    gap1 = np.linalg.norm(A.T @ A - B1.T @ B1, ord=2)
    assert gap1 <= bound + 1e-6
    # the registered query serves the sketch spectrum
    rows = frequent_directions_spectrum(spark, SF_DIR).collect()
    assert len(rows) == min(ELL, len(sb))
    assert rows[0]["singular_value"] == pytest.approx(
        round(float(sb[0]), 4), abs=1e-9
    )
    assert rows[-1]["cum_energy"] == pytest.approx(1.0, abs=1e-6)
    # top direction must capture real structure (embeddings aren't noise)
    assert rows[0]["cum_energy"] > 0.1


def test_feature_information_gain_matches_counter_referee(spark):
    """R223 referee: pure-Python Counter entropy/Gini over the same
    three features."""
    import math
    from collections import Counter

    from zoom_spark.queries.ml_primitives import feature_information_gain

    rows = {
        r["feature"]: r
        for r in feature_information_gain(spark, SF_DIR).collect()
    }
    o = _orders()
    y = (o["o_orderpriority"] == "1-URGENT").astype(int)
    days = (
        pd.to_datetime(o["o_orderdate"]).dt.normalize()
        - pd.Timestamp("1970-01-01")
    ).dt.days
    feats = {
        "status": o["o_orderstatus"],
        "weekday": (days % 7).astype(str),
        "price_bucket": np.floor(o["o_totalprice"] / 100000)
        .astype(int)
        .astype(str),
    }

    def h(p):
        return sum(
            -q * math.log(q) for q in (p, 1 - p) if q > 0
        )

    p_all = y.mean()
    hy, gy = h(p_all), 2 * p_all * (1 - p_all)
    for name, f in feats.items():
        cells = Counter(zip(f, y))
        byval: dict = {}
        for (v, yy), c in cells.items():
            n, pos = byval.get(v, (0, 0))
            byval[v] = (n + c, pos + yy * c)
        n_tot = len(y)
        hc = sum(
            (n / n_tot) * h(pos / n) for n, pos in byval.values()
        )
        gc = sum(
            (n / n_tot) * 2 * (pos / n) * (1 - pos / n)
            for n, pos in byval.values()
        )
        r = rows[name]
        assert r["n_values"] == len(byval)
        assert r["info_gain"] == pytest.approx(hy - hc, abs=2e-6)
        assert r["gini_gain"] == pytest.approx(gy - gc, abs=2e-6)
    # IG is non-negative by Jensen; some feature must carry signal >= 0
    assert all(r["info_gain"] >= -1e-9 for r in rows.values())


def test_target_encoding_oof_no_leakage(spark):
    """R224 referee: recompute each (cat, fold) encoding from the raw
    frame EXCLUDING that fold, and verify the leakage property — the
    fold's own rows never contribute to its encoding."""
    from zoom_spark.queries.ml_primitives import (
        TE_FOLDS,
        TE_SMOOTH_M,
        target_encoding_oof,
    )

    rows = target_encoding_oof(spark, SF_DIR).collect()
    o = _orders()
    o["fold"] = o["o_orderkey"] % TE_FOLDS
    assert len(rows) == 5 * TE_FOLDS
    for r in rows[:12]:
        others = o[
            (o["o_orderpriority"] == r["cat"]) & (o["fold"] != r["fold"])
        ]["o_totalprice"]
        g_others = o[o["fold"] != r["fold"]]["o_totalprice"]
        assert r["te_raw"] == pytest.approx(
            round(others.mean(), 6), abs=2e-6
        )
        want_sm = (others.sum() + TE_SMOOTH_M * g_others.mean()) / (
            len(others) + TE_SMOOTH_M
        )
        assert r["te_smoothed"] == pytest.approx(want_sm, abs=2e-6)
        own = o[
            (o["o_orderpriority"] == r["cat"]) & (o["fold"] == r["fold"])
        ]["o_totalprice"]
        assert r["n_fold"] == len(own)
        # leakage check: the all-folds mean differs from the OOF mean
        full = o[o["o_orderpriority"] == r["cat"]]["o_totalprice"].mean()
        assert abs(full - others.mean()) > 1e-9


def test_shapley_attribution_axioms_and_referee(spark):
    """R225 referee: brute-force Shapley over all 3! orderings from
    pandas-computed coalition values; efficiency axiom checked."""
    from itertools import permutations

    from zoom_spark.queries.ml_primitives import (
        shapley_channel_attribution,
    )

    rows = {
        r["channel"]: r["shapley"]
        for r in shapley_channel_attribution(spark, SF_DIR).collect()
    }
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    conv = set(ev[ev["event_type"] == "purchase"]["user_id"])
    chans = ["view", "click", "signup"]
    touched = {
        c: set(ev[ev["event_type"] == c]["user_id"]) & conv for c in chans
    }
    masks = {}
    for u in conv:
        masks[u] = frozenset(c for c in chans if u in touched[c])

    def v(S):
        S = set(S)
        return sum(1 for m in masks.values() if m <= S)

    phi = {c: 0.0 for c in chans}
    for perm in permutations(chans):
        seen: list = []
        for c in perm:
            phi[c] += v(seen + [c]) - v(seen)
            seen.append(c)
    phi = {c: p / 6 for c, p in phi.items()}
    for c in chans:
        assert rows[c] == pytest.approx(round(phi[c], 6), abs=1e-6)
    # efficiency: sum of shapley values = v(all) - v(empty)
    assert sum(rows.values()) == pytest.approx(
        v(chans) - v([]), abs=1e-3
    )
    assert v([]) >= 0 and v(chans) == len(conv)


def test_heaps_law_matches_dict_referee(spark):
    """R226 referee: single-threaded first-occurrence scan over the
    concatenated token stream."""
    import math

    from zoom_spark.queries.corpus_stats import HEAPS_POINTS, heaps_law_fit

    rows = heaps_law_fit(spark, SF_DIR).collect()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet").sort_values(
        "doc_id"
    )
    stream: list = []
    for t in docs["text"]:
        ws = [w for w in t.strip().lower().split() if w]
        stream.extend(
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        )
    n = len(stream)
    firstpos: dict = {}
    for i, w in enumerate(stream, 1):
        firstpos.setdefault(w, i)
    pts = {}
    for k in range(1, HEAPS_POINTS + 1):
        nk = int(n // 2 ** (HEAPS_POINTS - k))
        pts[k] = (nk, sum(1 for fpv in firstpos.values() if fpv <= nk))
    got = {r["k"]: r for r in rows}
    assert set(got) == set(pts)
    for k, (nk, vk) in pts.items():
        assert got[k]["n_k"] == nk
        assert got[k]["vocab"] == vk
    xs = [math.log(nk) for nk, _ in pts.values()]
    ys = [math.log(vk) for _, vk in pts.values()]
    ax, ay = sum(xs) / len(xs), sum(ys) / len(ys)
    beta = sum(
        (x - ax) * (yv - ay) for x, yv in zip(xs, ys)
    ) / sum((x - ax) ** 2 for x in xs)
    assert got[1]["beta"] == pytest.approx(round(beta, 6), abs=2e-6)
    # Heaps exponent must be sublinear and positive on real text
    assert 0 < got[1]["beta"] < 1


def test_hoeffding_cs_matches_referee_and_is_anytime_valid(spark):
    """R227 referee: recompute every checkpoint from the pandas-sorted
    stream; verify the union bound actually spends < alpha and the
    interval is monotone-shrinking in width."""
    import math

    from zoom_spark.queries.experimentation import (
        CS_ALPHA,
        CS_LNC,
        CS_POINTS,
        hoeffding_confidence_sequence,
    )

    rows = sorted(
        hoeffding_confidence_sequence(spark, SF_DIR).collect(),
        key=lambda r: r["k"],
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["ts", "event_id"]
    )
    x = (ev["event_type"] == "purchase").to_numpy().astype(int)
    n = len(x)
    cum = np.cumsum(x)
    assert len(rows) == CS_POINTS
    widths = []
    for r in rows:
        k = r["k"]
        nk = n * k // CS_POINTS
        kp = int(cum[nk - 1])
        assert r["n_k"] == nk
        assert r["k_purchases"] == kp
        ph = kp / nk
        hw = math.sqrt(CS_LNC[k] / (2 * nk))
        assert r["p_hat"] == pytest.approx(round(ph, 6), abs=1e-9)
        assert r["ci_lo"] == pytest.approx(
            round(max(ph - hw, 0.0), 6), abs=1e-9
        )
        assert r["ci_hi"] == pytest.approx(
            round(min(ph + hw, 1.0), 6), abs=1e-9
        )
        widths.append(r["ci_hi"] - r["ci_lo"])
    # spending schedule is a valid union bound
    assert sum(CS_ALPHA / (k * (k + 1)) for k in range(1, CS_POINTS + 1)) < CS_ALPHA
    # widths shrink as n grows (the defining CS property here)
    assert all(w2 < w1 + 1e-12 for w1, w2 in zip(widths, widths[1:]))
    # every interval contains the final empirical rate (sanity on this
    # stationary fixture — not a theorem, but a red flag if violated)
    p_final = cum[-1] / n
    for r in rows:
        assert r["ci_lo"] - 1e-9 <= p_final <= r["ci_hi"] + 1e-9


def test_partial_correlation_matches_numpy_referee(spark):
    from zoom_spark.queries.diagnostics import (
        _JB_SCALE,
        partial_correlation_daily,
    )

    [got] = partial_correlation_daily(spark, SF_DIR).collect()
    o = _orders()
    g = o.groupby("o_orderdate").agg(
        x=("o_totalprice", "sum"),
        y=("o_custkey", "nunique"),
        z=("o_orderkey", "size"),
    )
    x = np.round(g["x"].to_numpy() * _JB_SCALE, 6)
    y = g["y"].to_numpy().astype(float)
    z = g["z"].to_numpy().astype(float)
    C = np.corrcoef(np.vstack([x, y, z]))
    rxy, rxz, ryz = C[0, 1], C[0, 2], C[1, 2]
    part = (rxy - rxz * ryz) / np.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert got["n_days"] == len(g)
    assert got["r_rev_cust"] == pytest.approx(rxy, abs=1e-4)
    assert got["r_rev_orders"] == pytest.approx(rxz, abs=1e-4)
    assert got["r_cust_orders"] == pytest.approx(ryz, abs=1e-4)
    assert got["partial_rev_cust_given_orders"] == pytest.approx(
        part, abs=1e-3
    )
    # the control is binding: partial must differ from the raw corr
    assert abs(got["partial_rev_cust_given_orders"] - got["r_rev_cust"]) > 1e-4


def test_jl_projection_numpy_parity_and_distance_preservation(spark):
    """R230 referee: exact numpy parity of the deterministic
    projection, plus the JL statistics — squared-distance ratios
    concentrate around 1 on sampled pairs."""
    import random

    from zoom_spark.queries.similarity_queries import jl_random_projection
    from zoom_spark.similarity.fd import achlioptas_matrix

    rows = jl_random_projection(spark, SF_DIR).collect()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    A = np.stack(emb.sort_values("vec_id")["embedding"].to_numpy()).astype(
        np.float64
    )
    ids = emb.sort_values("vec_id")["vec_id"].to_numpy()
    R = np.array(achlioptas_matrix(A.shape[1], 16))  # (16, 64)
    P = A @ R.T
    got = {r["vec_id"]: r["proj_csv"] for r in rows}
    assert len(got) == len(ids)
    for idx in range(0, len(ids), max(1, len(ids) // 50)):
        # Numeric compare with atol 1e-4, not bit-exact string equality:
        # Spark's and numpy's dot-product summation orders differ, so a
        # true value sitting on the 4dp half-grid can legitimately render
        # 0.0499 vs 0.0500 (round-6 verdict item 1).
        have = np.array([float(v) for v in got[ids[idx]].split(",")])
        assert np.allclose(have, P[idx], atol=1.01e-4)
    # matrix sparsity ~2/3 and symmetric signs
    fr = np.abs(R) > 0
    assert 0.25 < fr.mean() < 0.42
    # JL distance preservation on 300 sampled pairs
    rng = random.Random(11)
    ratios = []
    for _ in range(300):
        i, j = rng.randrange(len(ids)), rng.randrange(len(ids))
        if i == j:
            continue
        d0 = float(((A[i] - A[j]) ** 2).sum())
        d1 = float(((P[i] - P[j]) ** 2).sum())
        if d0 > 0:
            ratios.append(d1 / d0)
    ratios = np.array(ratios)
    assert abs(ratios.mean() - 1.0) < 0.1  # unbiased on average
    assert (ratios > 0.3).all() and (ratios < 2.5).all()  # k=16 tails


def test_friedman_matches_rank_referee(spark):
    """R232 referee: pandas rank-within-block recomputation."""
    from zoom_spark.queries.rank_stats import friedman_priority_by_weekday

    [got] = friedman_priority_by_weekday(spark, SF_DIR).collect()
    o = _orders()
    days = (
        pd.to_datetime(o["o_orderdate"]).dt.normalize()
        - pd.Timestamp("1970-01-01")
    ).dt.days
    o = o.assign(block=days % 7)
    cell = (
        o.groupby(["block", "o_orderpriority"])["o_totalprice"]
        .mean()
        .round(4)
        .reset_index(name="m")
    )
    cell["r"] = cell.groupby("block")["m"].rank(method="min")
    rj = cell.groupby("o_orderpriority")["r"].sum()
    k, b = len(rj), cell["block"].nunique()
    ss = float((rj**2).sum())
    chi2 = 12.0 * ss / (b * k * (k + 1)) - 3.0 * b * (k + 1)
    assert got["n_treatments"] == k and got["n_blocks"] == b
    assert got["friedman_chi2"] == pytest.approx(round(chi2, 6), abs=1e-6)
    assert got["kendalls_w"] == pytest.approx(
        round(chi2 / (b * (k - 1)), 6), abs=1e-6
    )
    # W is a concordance coefficient: 0 <= W <= 1
    assert -1e-9 <= got["kendalls_w"] <= 1 + 1e-9


def test_overdispersion_matches_numpy_referee(spark):
    from zoom_spark.queries.rank_stats import overdispersion_daily_events

    [got] = overdispersion_daily_events(spark, SF_DIR).collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    c = ev.groupby(pd.to_datetime(ev["ts"]).dt.normalize()).size()
    mean_c, var_c = round(c.mean(), 6), round(c.var(ddof=1), 6)
    assert got["n_days"] == len(c)
    assert got["n_events"] == int(c.sum())
    assert got["mean_c"] == pytest.approx(mean_c, abs=1e-9)
    assert got["var_c"] == pytest.approx(var_c, abs=1e-9)
    assert got["dispersion_index"] == pytest.approx(
        round(var_c / mean_c, 6), abs=1e-6
    )
    assert got["chi2_stat"] == pytest.approx(
        round((len(c) - 1) * var_c / mean_c, 6), abs=1e-4
    )


def test_l_diversity_matches_counter_referee(spark):
    """R234 referee: per-class Counter entropy; also the structural
    relations distinct_l >= entropy_l and entropy_l <= class_size."""
    import math
    from collections import Counter

    from zoom_spark.queries.warehouse_ops import l_diversity_report

    rows = {
        (r["qi1"], r["qi2"]): r
        for r in l_diversity_report(spark, SF_DIR).collect()
    }
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    c["qi2"] = c["c_nationkey"] % 5
    c["sens"] = np.floor(c["c_acctbal"] / 2000).astype(int)
    for (q1, q2), grp in c.groupby(["c_mktsegment", "qi2"]):
        r = rows[(q1, q2)]
        cnt = Counter(grp["sens"])
        n = len(grp)
        h = -sum((v / n) * math.log(v / n) for v in cnt.values())
        assert r["class_size"] == n
        assert r["distinct_l"] == len(cnt)
        assert r["entropy_nats"] == pytest.approx(round(h, 6), abs=2e-6)
        assert r["entropy_l"] == pytest.approx(
            round(math.exp(round(h, 6)), 4), abs=1e-4
        )
        assert r["entropy_l"] <= r["distinct_l"] + 1e-9
    assert len(rows) == c.groupby(["c_mktsegment", "qi2"]).ngroups


def test_sorted_neighborhood_matches_bruteforce_referee(spark):
    """R235 referee: brute-force the sorted window from the pandas
    vocabulary with the repo's pure-Python jaro (independent of the
    Spark plan), and verify the SNM candidate contract (only
    rank-gap <= W pairs are scored)."""
    from zoom_spark.functions.jaro import jaro_winkler
    from zoom_spark.queries.round6_breadth import (
        SNM_THRESHOLD,
        SNM_WINDOW,
        sorted_neighborhood_pairs,
    )

    rows = sorted_neighborhood_pairs(spark, SF_DIR).collect()
    names = sorted(
        pd.read_parquet(f"{SF_DIR}/part.parquet")["p_name"].unique()
    )
    want = {}
    for i, a in enumerate(names):
        for k in range(1, SNM_WINDOW + 1):
            if i + k < len(names):
                b = names[i + k]
                jw = round(jaro_winkler(a, b), 6)
                if jw >= SNM_THRESHOLD:
                    want[(a, b)] = (k, jw)
    got = {(r["name_a"], r["name_b"]): (r["rank_gap"], r["jw"]) for r in rows}
    assert got == want
    assert want, "fixture must produce SNM matches"


def test_exponential_fit_matches_numpy_referee(spark):
    """R236 referee: numpy MLE + two-sided KS against the fitted
    exponential on the same per-user gaps."""
    from zoom_spark.queries.survival import exponential_fit_interevent

    [got] = exponential_fit_interevent(spark, SF_DIR).collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    us = ev["ts"].astype("int64")  # ns or us depending on encoding
    unit = 1e9 if us.iloc[0] > 10**17 else 1e6
    gaps = []
    for _, grp in ev.groupby("user_id"):
        t = grp["ts"].astype("int64").to_numpy()
        d = np.diff(t) / unit
        gaps.extend(d[d > 0])
    x = np.sort(np.array(gaps))
    n = len(x)
    mean_x = round(x.mean(), 6)
    fitted = 1 - np.exp(-x / mean_x)
    i = np.arange(1, n + 1)
    ks = max(
        np.max(np.abs(i / n - fitted)),
        np.max(np.abs((i - 1) / n - fitted)),
    )
    assert got["n_gaps"] == n
    assert got["mean_gap_sec"] == pytest.approx(mean_x, abs=1e-6)
    assert got["lambda_per_sec"] == pytest.approx(
        round(1 / mean_x, 8), abs=1e-8
    )
    assert got["ks_stat"] == pytest.approx(round(ks, 6), abs=2e-6)
    assert 0 < got["ks_stat"] < 1


def test_dp_median_matches_gumbel_referee(spark):
    """R237 referee: recompute the exponential-mechanism winner
    single-threaded (hashlib uniforms, Gumbel-max over all distinct
    values) and check the privacy-utility contract — the DP median's
    rank error is small relative to n at eps=1."""
    import hashlib
    import math

    from zoom_spark.queries.warehouse_ops import (
        DPQ_EPS,
        dp_median_exponential_mechanism,
    )

    [got] = dp_median_exponential_mechanism(spark, SF_DIR).collect()
    x = sorted(_orders()["o_totalprice"])
    n = len(x)
    # distinct values with ranks (count of values <= v)
    ranks = {}
    for i, v in enumerate(x, 1):
        ranks[v] = i  # max index = count <= v
    best_v, best_s, best_u = None, -math.inf, None
    for v, r in ranks.items():
        util = -abs(r - n / 2.0)
        # both engines hash the value's decimal string rendering
        key = str(v)
        u01 = (
            1.0
            + int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
        ) / 4294967297.0
        s = DPQ_EPS / 2.0 * util - math.log(-math.log(u01))
        if s > best_s or (s == best_s and v < best_v):
            best_v, best_s, best_u = v, s, util
    assert got["n"] == n
    assert got["dp_median"] == pytest.approx(best_v, abs=1e-9)
    assert got["rank_utility"] == pytest.approx(
        round(best_u, 4) + 0.0, abs=1e-9
    )
    assert got["winning_score"] == pytest.approx(
        round(best_s, 6), abs=2e-6
    )
    # utility contract: selected rank within 1% of the true median rank
    assert abs(best_u) <= max(20, 0.01 * n)


def test_huber_matches_numpy_irls_referee(spark):
    """R238 referee: independent numpy IRLS (same schedule: OLS start,
    MAD scale, k=1.345, 2 iterations) on the unrounded day series —
    loose-but-binding tolerance since rounding schedules differ; plus
    the robustness contract (huber slope finite, weights <= n)."""
    from zoom_spark.queries.diagnostics import (
        HUBER_K,
        _JB_SCALE,
        huber_regression_revenue_trend,
    )

    [got] = huber_regression_revenue_trend(spark, SF_DIR).collect()
    o = _orders()
    g = o.groupby("o_orderdate")["o_totalprice"].sum().sort_index()
    t = np.array(
        [
            (pd.Timestamp(d) - pd.Timestamp("1970-01-01")).days
            for d in g.index
        ],
        dtype=float,
    )
    y = np.round(g.to_numpy() * _JB_SCALE, 6)
    n = len(y)

    def wls(w):
        mt, my = (w * t).sum() / w.sum(), (w * y).sum() / w.sum()
        b1 = ((w * (t - mt) * (y - my)).sum()) / (
            (w * (t - mt) ** 2).sum()
        )
        return b1, my - b1 * mt

    b1, b0 = wls(np.ones(n))
    ols_slope = b1
    for _ in range(2):
        r = np.abs(y - b0 - b1 * t)
        s = np.median(r) / 0.6745
        w = np.minimum(1.0, HUBER_K * s / np.maximum(r, 1e-12))
        b1, b0 = wls(w)
    assert got["n_days"] == n
    assert got["slope_ols"] == pytest.approx(ols_slope, abs=1e-4)
    assert got["slope_huber"] == pytest.approx(b1, abs=5e-4)
    assert got["intercept_huber"] == pytest.approx(b0, abs=50.0 * 1e-4 * abs(b0) + 0.5)
    assert 0 < got["total_weight"] <= n
    # outlier days exist, so some weights must actually be < 1
    assert got["total_weight"] < n - 0.5


def test_risk_ratio_matches_lgamma_free_referee(spark):
    import math

    from zoom_spark.queries.diagnostics import (
        RR_Z,
        risk_ratio_weekend_purchase,
    )

    [got] = risk_ratio_weekend_purchase(spark, SF_DIR).collect()
    a, b = got["weekend_purchases"], got["weekend_other"]
    c, d = got["weekday_purchases"], got["weekday_other"]
    # cross-check counts against the Fisher query's table
    from zoom_spark.queries.experimentation import (
        fisher_exact_weekend_purchase,
    )

    [f] = fisher_exact_weekend_purchase(spark, SF_DIR).collect()
    assert (a, b, c, d) == (
        f["weekend_purchases"],
        f["weekend_other"],
        f["weekday_purchases"],
        f["weekday_other"],
    )
    lrr = math.log((a / (a + b)) / (c / (c + d)))
    se = math.sqrt(1 / a - 1 / (a + b) + 1 / c - 1 / (c + d))
    assert got["risk_ratio"] == pytest.approx(math.exp(lrr), abs=1e-5)
    assert got["rr_ci_lo"] == pytest.approx(
        math.exp(lrr - RR_Z * se), abs=1e-4
    )
    assert got["rr_ci_hi"] == pytest.approx(
        math.exp(lrr + RR_Z * se), abs=1e-4
    )
    # CI ordering and containment of the point estimate
    assert got["rr_ci_lo"] < got["risk_ratio"] < got["rr_ci_hi"]
    assert got["or_ci_lo"] < got["odds_ratio"] < got["or_ci_hi"]
    # OR is farther from 1 than RR (|log OR| >= |log RR|, same sign)
    assert abs(math.log(got["odds_ratio"])) >= abs(
        math.log(got["risk_ratio"])
    ) - 1e-9


def test_spiegelhalter_z_matches_pandas_referee(spark):
    from zoom_spark.queries.diagnostics import spiegelhalter_z_calibration

    [got] = spiegelhalter_z_calibration(spark, SF_DIR).collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["hr"] = pd.to_datetime(ev["ts"]).dt.hour
    ev["o"] = (ev["event_type"] == "purchase").astype(float)
    train = ev[ev["event_id"] % 2 == 0]
    test = ev[ev["event_id"] % 2 == 1].copy()
    fc = train.groupby("hr")["o"].mean().round(6)
    test["fc"] = test["hr"].map(fc)
    num = ((test["o"] - test["fc"]) * (1 - 2 * test["fc"])).sum()
    var = (
        test["fc"] * (1 - test["fc"]) * (1 - 2 * test["fc"]) ** 2
    ).sum()
    z = num / np.sqrt(var)
    assert got["n"] == len(test)
    assert got["spiegelhalter_z"] == pytest.approx(round(z, 6), abs=2e-5)
    # a train/test split of a stationary process: |Z| should be modest
    assert abs(got["spiegelhalter_z"]) < 5


def test_k_truss_matches_python_peeling_referee(spark):
    """R241 referee: pure-Python iterative truss peeling (set-based
    support recount each round) on the same co-purchase graph."""
    from itertools import combinations

    from zoom_spark.queries.advanced_analytics import k_truss_copurchase

    rows = k_truss_copurchase(spark, SF_DIR).collect()
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(grp["l_partkey"].unique()), 2):
            edges.add((a, b))

    K = 4
    while True:
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        support = {
            (a, b): len(adj[a] & adj[b]) for a, b in edges
        }
        keep = {e for e in edges if support[e] >= K - 2}
        if keep == edges:
            break
        edges = keep
    got = {(r["u"], r["v"]): r["support"] for r in rows}
    assert set(got) == edges
    for e in list(edges)[:200]:
        assert got[e] == support[e]
    # fixpoint is non-trivial: something was peeled, something survived
    assert edges

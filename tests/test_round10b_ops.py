"""Independent referees for the round-10 second-wave operators (R366+).

Each test recomputes the statistic from the raw parquet with
pandas/numpy using the ORIGINAL textbook formulation (not the SQL
decomposition), then compares against the registered query."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR
from zoom_spark.io import load_table


def test_cochrans_q_matches_textbook(spark):
    from zoom_spark.queries.round10b_ops import cochrans_q_yearly_activity

    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate"
    ).toPandas()
    c = load_table(spark, SF_DIR, "customer").select("c_custkey").toPandas()
    o["yr"] = o["o_orderdate"].dt.year
    y0 = int(o["yr"].min())
    # textbook: binary matrix X (subjects x k), Q = k(k-1) sum_j (C_j - Cbar)^2
    #           / sum_i R_i (k - R_i)
    x = np.zeros((len(c), 3), dtype=np.int64)
    idx = {ck: i for i, ck in enumerate(c["c_custkey"])}
    for j in range(3):
        active = o.loc[o["yr"] == y0 + j, "o_custkey"].unique()
        for ck in active:
            x[idx[ck], j] = 1
    k = 3
    col = x.sum(axis=0)
    row = x.sum(axis=1)
    q = (
        k * (k - 1) * ((col - col.mean()) ** 2).sum()
        / (row * (k - row)).sum()
    )
    [r] = cochrans_q_yearly_activity(spark, SF_DIR).collect()
    assert r["n_subjects"] == len(c)
    assert [r["c0"], r["c1"], r["c2"]] == col.tolist()
    assert abs(r["q_stat"] - q) < 1e-6
    assert abs(r["p_value"] - math.exp(-q / 2)) < 1e-6
    # the BIGINT ratio must reproduce the float statistic exactly
    assert abs(r["q_num"] / r["q_den"] - q) < 1e-9


def test_bowker_matches_textbook(spark):
    from zoom_spark.queries.round10b_ops import bowker_symmetry_priority

    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"
    ).toPandas()

    def bucket(p):
        if p in ("1-URGENT", "2-HIGH"):
            return 0
        if p == "3-MEDIUM":
            return 1
        return 2

    o["b"] = o["o_orderpriority"].map(bucket)
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    n = np.zeros((3, 3), dtype=np.int64)
    for _, g in o.groupby("o_custkey"):
        bs = g["b"].to_numpy()
        for a, b in zip(bs[:-1], bs[1:]):
            n[a, b] += 1
    chi2 = sum(
        (n[i, j] - n[j, i]) ** 2 / (n[i, j] + n[j, i])
        for i in range(3)
        for j in range(i + 1, 3)
        if n[i, j] + n[j, i] > 0
    )
    [r] = bowker_symmetry_priority(spark, SF_DIR).collect()
    assert r["n_transitions"] == int(n.sum())
    assert (r["n01"], r["n10"]) == (n[0, 1], n[1, 0])
    assert (r["n02"], r["n20"]) == (n[0, 2], n[2, 0])
    assert (r["n12"], r["n21"]) == (n[1, 2], n[2, 1])
    assert r["df"] == 3
    assert abs(r["chi2"] - chi2) < 1e-5  # 3 per-term 1e-9 floors


def test_cuzick_matches_textbook(spark):
    from zoom_spark.queries.round10b_ops import cuzick_trend_priority_price

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    lscore = o["o_orderpriority"].str[0].astype(int).to_numpy()
    cents = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype("int64")
    ranks = pd.Series(cents).rank(method="average").to_numpy()
    n = len(o)
    t_ = float((lscore * ranks).sum())
    el = (n + 1) * lscore.sum() / 2.0
    _, tie_counts = np.unique(cents, return_counts=True)
    tie3 = float(((tie_counts**3) - tie_counts).sum())
    var = (
        ((n + 1) / 12.0)
        * (n * (lscore**2).sum() - lscore.sum() ** 2)
        * (1 - tie3 / (n**3 - n))
    )
    z = (t_ - el) / math.sqrt(var)
    [r] = cuzick_trend_priority_price(spark, SF_DIR).collect()
    assert r["n"] == n
    assert r["t2"] == int(round(2 * t_))
    assert r["e2"] == int(round(2 * el))
    assert abs(r["z_stat"] - z) < 1e-6


def test_adf_matches_lstsq(spark):
    from zoom_spark.queries.round10b_ops import adf_unit_root_revenue

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype(
        "int64"
    )
    d = (
        o.groupby(o["o_orderdate"].dt.normalize())["cents"].sum() // 100
    ).sort_index()
    y = d.to_numpy(dtype=np.float64)
    dy = np.diff(y)
    # regression rows t = 3..T: dy_t on [1, y_{t-1}, dy_{t-1}]
    yv = dy[1:]
    x = np.column_stack([np.ones(len(yv)), y[1:-1], dy[:-1]])
    beta, *_ = np.linalg.lstsq(x, yv, rcond=None)
    resid = yv - x @ beta
    s2 = (resid**2).sum() / (len(yv) - 3)
    cov = s2 * np.linalg.inv(x.T @ x)
    t_rho = beta[1] / math.sqrt(cov[1, 1])
    [r] = adf_unit_root_revenue(spark, SF_DIR).collect()
    assert r["n_obs"] == len(yv)
    assert abs(r["rho"] - beta[1]) < 1e-5
    assert abs(r["phi"] - beta[2]) < 1e-5
    assert abs(r["const"] - beta[0]) < max(0.02, 1e-5 * abs(beta[0]))
    assert abs(r["adf_t"] - t_rho) < 1e-5
    # a unit-root regression on a mean-reverting daily total should
    # reject hard: rho must be negative (pulls back toward the mean)
    assert r["rho"] < 0


def _copurchase_nbrs(spark, min_support=1):
    import collections

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .toPandas()
        .drop_duplicates()
    )
    cnt = collections.Counter()
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(set(g["l_partkey"]))
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                cnt[(u, v)] += 1
    nbr = collections.defaultdict(set)
    for (u, v), c in cnt.items():
        if c >= min_support:
            nbr[u].add(v)
            nbr[v].add(u)
    return nbr


def test_label_propagation_matches_python(spark):
    import collections

    from zoom_spark.queries.round10b_ops import (
        _LPA_MIN_SUPPORT,
        _LPA_ROUNDS,
        label_propagation_copurchase,
    )

    nbr = _copurchase_nbrs(spark, _LPA_MIN_SUPPORT)
    lab = {n: n for n in nbr}
    for _ in range(_LPA_ROUNDS):
        lab = {
            n: sorted(
                collections.Counter(lab[x] for x in nbr[n]).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0][0]
            for n in nbr
        }
    sizes = collections.Counter(lab.values())
    mins = collections.defaultdict(lambda: 1 << 62)
    for n, c in lab.items():
        mins[c] = min(mins[c], n)
    got = {
        r["community"]: (r["size"], r["min_node"])
        for r in label_propagation_copurchase(spark, SF_DIR).collect()
    }
    assert got == {c: (s, mins[c]) for c, s in sizes.items()}


def test_link_prediction_panel_matches_python(spark):
    import hashlib

    from zoom_spark.queries.round10b_ops import (
        _LP_QUERY_PREFIX,
        link_prediction_panel,
    )

    nbr = _copurchase_nbrs(spark, 1)

    def in_q(x):
        h = hashlib.md5(str(x).encode()).hexdigest()
        return h[0] == _LP_QUERY_PREFIX and h[1] < "4"

    rows = []
    for a in nbr:
        if not in_q(a):
            continue
        for b in nbr:
            if b == a or b in nbr[a]:
                continue
            common = nbr[a] & nbr[b]
            if not common:
                continue
            cn = len(common)
            ra9 = sum(10**9 // len(nbr[z]) for z in common)
            rows.append(
                (
                    a,
                    b,
                    cn,
                    round(cn / (len(nbr[a]) + len(nbr[b]) - cn), 6),
                    len(nbr[a]) * len(nbr[b]),
                    round(ra9 / 1e9, 6),
                )
            )
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    expect = rows[:50]
    got = [tuple(r) for r in link_prediction_panel(spark, SF_DIR).collect()]
    assert got == expect


def test_err_matches_python(spark):
    from zoom_spark.queries.round10b_ops import (
        _ERR_DEPTH,
        err_ranking_segments,
    )

    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment"
    ).toPandas()
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype(
        "int64"
    )
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    g = m.groupby(["c_mktsegment", "c_custkey"]).agg(
        cents=("cents", "sum"), n=("cents", "size")
    )
    expect = {}
    for seg, sub in g.reset_index().groupby("c_mktsegment"):
        sub = sub.sort_values(
            ["cents", "c_custkey"], ascending=[False, True]
        ).head(_ERR_DEPTH)
        grades = [min(4, int(n) // 4) for n in sub["n"]]
        # textbook cascade ERR, then replay the engine's per-term snap
        err9 = 0
        prod = 1.0
        for r, gr in enumerate(grades, start=1):
            rel = (2**gr - 1) / 16
            err9 += math.floor(rel * prod / r * 1e9 + 0.5)
            prod *= 1 - rel
        expect[seg] = (len(grades), round(err9 / 1e9, 6))
    got = {
        r["segment"]: (r["n_ranked"], r["err"])
        for r in err_ranking_segments(spark, SF_DIR).collect()
    }
    assert got == expect


def test_rbo_matches_python(spark):
    from zoom_spark.queries.round10b_ops import (
        _RBO_DEPTH,
        rbo_nation_rankings,
    )

    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype(
        "int64"
    )
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    g = m.groupby("c_nationkey").agg(cents=("cents", "sum"), n=("cents", "size"))
    by_rev = sorted(g.index, key=lambda k: (-g.loc[k, "cents"], k))
    by_cnt = sorted(g.index, key=lambda k: (-g.loc[k, "n"], k))
    ra = {k: i + 1 for i, k in enumerate(by_rev)}
    rb = {k: i + 1 for i, k in enumerate(by_cnt)}
    rbo9 = 0
    xd_at = {}
    for d in range(1, _RBO_DEPTH + 1):
        xd = sum(1 for k in g.index if max(ra[k], rb[k]) <= d)
        xd_at[d] = xd
        rbo9 += math.floor(xd / (d * 2**d) * 1e9 + 0.5)
    [r] = rbo_nation_rankings(spark, SF_DIR).collect()
    assert r["n_items"] == len(g)
    assert r["x10"] == xd_at[10]
    assert r["x20"] == xd_at[_RBO_DEPTH]
    assert abs(r["rbo"] - round(rbo9 / 1e9, 6)) < 1e-9
    # RBO is bounded by the final-depth agreement and by 1
    assert 0.0 <= r["rbo"] <= 1.0


def test_richness_spectrum_matches_python(spark):
    import collections
    import re

    from zoom_spark.queries.round10b_ops import corpus_richness_spectrum

    docs = load_table(spark, SF_DIR, "documents").select("text").toPandas()
    cnt = collections.Counter()
    for t in docs["text"]:
        cnt.update(w for w in re.split(r"\s+", t.strip().lower()) if w)
    n = sum(cnt.values())
    v = len(cnt)
    spectrum = collections.Counter(cnt.values())
    v1, v2 = spectrum[1], spectrum[2]
    s2 = sum(m * m for m in cnt.values())
    yules_k = 1e4 * (s2 - n) / n**2
    simpson = sum(m * (m - 1) for m in cnt.values()) / (n * (n - 1))
    honore = 100 * math.log(n) / (1 - v1 / v)
    [r] = corpus_richness_spectrum(spark, SF_DIR).collect()
    assert (r["n_tokens"], r["n_types"], r["v1"], r["v2"]) == (n, v, v1, v2)
    assert abs(r["yules_k"] - yules_k) < 1e-5
    assert abs(r["simpson_d"] - simpson) < 1e-6
    assert abs(r["sichel_s"] - v2 / v) < 1e-6
    assert abs(r["honore_r"] - honore) < 1e-4


def test_hoover_palma_matches_python(spark):
    from zoom_spark.queries.round10b_ops import hoover_palma_spend

    c = load_table(spark, SF_DIR, "customer").select("c_custkey").toPandas()
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype(
        "int64"
    )
    spend = {k: 0 for k in c["c_custkey"]}
    for k, v in o.groupby("o_custkey")["cents"].sum().items():
        spend[k] = int(v)
    xs = sorted(spend.items(), key=lambda kv: (kv[1], kv[0]))
    vals = [v for _, v in xs]
    n, s = len(vals), sum(vals)
    hoover = sum(abs(v - s / n) for v in vals) / (2 * s)
    bot40 = sum(vals[: (4 * n) // 10])
    top10 = sum(vals[n - n // 10 :])
    top1 = sum(vals[n - n // 100 :])
    [r] = hoover_palma_spend(spark, SF_DIR).collect()
    assert r["n_customers"] == n
    assert abs(r["hoover"] - hoover) < 1e-6
    assert abs(r["palma"] - top10 / bot40) < 1e-6
    assert abs(r["top10_share"] - top10 / s) < 1e-6
    assert abs(r["bottom40_share"] - bot40 / s) < 1e-6
    assert abs(r["top1_share"] - top1 / s) < 1e-6
    # sanity: Lorenz ordering means top10 share >= 10% on skewed spend
    assert r["top10_share"] >= 0.1


def test_youden_matches_python(spark):
    from zoom_spark.queries.round10b_ops import youden_j_threshold

    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_acctbal"
    ).toPandas()
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderpriority"
    ).toPandas()
    urgent = set(o.loc[o["o_orderpriority"] == "1-URGENT", "o_custkey"])
    c["score"] = (c["c_acctbal"] * 100 + 0.5).apply(math.floor).astype(
        "int64"
    )
    c["y"] = c["c_custkey"].isin(urgent).astype(int)
    pos, neg = int(c["y"].sum()), int((1 - c["y"]).sum())
    best = None
    for s in sorted(c["score"].unique()):
        tp = int(c.loc[c["score"] >= s, "y"].sum())
        fp = int((c["score"] >= s).sum()) - tp
        j_scaled = tp * neg - fp * pos
        key = (-j_scaled, s)
        if best is None or key < best[0]:
            best = (key, s, tp, fp, j_scaled)
    _, s_star, tp, fp, j_scaled = best
    [r] = youden_j_threshold(spark, SF_DIR).collect()
    assert (r["n_pos"], r["n_neg"]) == (pos, neg)
    assert r["threshold_cents"] == s_star
    assert (r["tp"], r["fp"]) == (tp, fp)
    assert abs(r["youden_j"] - j_scaled / (pos * neg)) < 1e-6


def test_theta_forecast_matches_python(spark):
    from zoom_spark.queries.round10b_ops import (
        _THETA_H,
        theta_forecast_revenue,
    )

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype(
        "int64"
    )
    d = (
        o.groupby(o["o_orderdate"].dt.normalize())["cents"].sum() // 100
    ).sort_index()
    y = d.to_numpy(dtype=np.float64)
    t = np.arange(1, len(y) + 1, dtype=np.float64)
    n = len(y)
    b = (n * (t * y).sum() - t.sum() * y.sum()) / (
        n * (t * t).sum() - t.sum() ** 2
    )
    a = (y.sum() - b * t.sum()) / n
    # textbook SES(1/2) recursion on the theta-2 line
    z = 2 * y - (a + b * t)
    level = z[0]
    for zt in z[1:]:
        level = 0.5 * zt + 0.5 * level
    rows = theta_forecast_revenue(spark, SF_DIR).collect()
    assert len(rows) == _THETA_H
    got = {r["h"]: r for r in rows}
    for h in range(1, _THETA_H + 1):
        r = got[h]
        assert r["n_days"] == n
        assert abs(r["intercept"] - a) < 1e-3
        assert abs(r["slope"] - b) < 1e-5
        # snapped weight-sum level vs float recursion: n terms on the
        # 1e-6 grid
        assert abs(r["theta2_level"] - level) < max(1e-2, n * 1e-6)
        expect = 0.5 * (a + b * (n + h)) + 0.5 * level
        assert abs(r["yhat"] - expect) < max(1e-2, n * 1e-6)


def test_proximity_search_matches_python(spark):
    import re

    from zoom_spark.queries.round10b_ops import (
        _PROX_W1,
        _PROX_W2,
        _PROX_WIN,
        proximity_search_postings,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).toPandas()
    expect = {}
    for _, row in docs.iterrows():
        toks = [w for w in re.split(r"\s+", row["text"].strip().lower()) if w]
        pa = [i + 1 for i, w in enumerate(toks) if w == _PROX_W1]
        pb = [i + 1 for i, w in enumerate(toks) if w == _PROX_W2]
        pairs = [
            (a, b) for a in pa for b in pb if abs(a - b) <= _PROX_WIN
        ]
        if pairs:
            expect[row["doc_id"]] = (
                len(pairs),
                min(abs(a - b) for a, b in pairs),
                min(min(a, b) for a, b in pairs),
            )
    got = {
        r["doc_id"]: (r["n_pairs"], r["min_dist"], r["first_pos"])
        for r in proximity_search_postings(spark, SF_DIR).collect()
    }
    assert got == expect


def test_breslow_day_matches_python(spark):
    from zoom_spark.queries.round10b_ops import breslow_day_weekend_value

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    ).toPandas()
    anchor = pd.Timestamp("1990-01-01")
    o["e"] = (
        ((o["o_orderdate"].dt.normalize() - anchor).dt.days % 7).isin([5, 6])
    ).astype(int)
    o["y"] = (o["o_totalprice"] > 150000).astype(int)
    tabs = []
    for _, g in o.groupby("o_orderpriority"):
        a = int(((g["e"] == 1) & (g["y"] == 1)).sum())
        b = int(((g["e"] == 1) & (g["y"] == 0)).sum())
        c_ = int(((g["e"] == 0) & (g["y"] == 1)).sum())
        d = int(((g["e"] == 0) & (g["y"] == 0)).sum())
        tabs.append((a, b, c_, d))
    # textbook MH common OR and BD statistic (floats, no snapping)
    psi = sum(a * d / (a + b + c_ + d) for a, b, c_, d in tabs) / sum(
        b * c_ / (a + b + c_ + d) for a, b, c_, d in tabs
    )
    bd = 0.0
    for a, b, c_, d in tabs:
        n1, n0, m1 = a + b, c_ + d, a + c_
        # psi (n1-A)(m1-A) = A (n0-m1+A)
        qa = 1 - psi
        qb = (n1 + m1) * psi + (n0 - m1)
        qc = -psi * n1 * m1
        atil = (-qb + math.sqrt(qb * qb - 4 * qa * qc)) / (2 * qa)
        var_inv = (
            1 / atil + 1 / (n1 - atil) + 1 / (m1 - atil)
            + 1 / (n0 - m1 + atil)
        )
        bd += (a - atil) ** 2 * var_inv
    [r] = breslow_day_weekend_value(spark, SF_DIR).collect()
    assert r["n_strata"] == len(tabs)
    assert r["df"] == len(tabs) - 1
    assert abs(r["or_mh"] - psi) < 1e-5  # per-stratum 1e-9 snaps
    assert abs(r["bd_chi2"] - bd) < 1e-4
    # fitted cells under the common OR must reproduce each margin:
    # BD of a single stratum is 0 by construction
    assert r["bd_chi2"] >= 0


def test_stuart_maxwell_matches_numpy(spark):
    from zoom_spark.queries.round10b_ops import stuart_maxwell_priority

    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"
    ).toPandas()

    def bucket(p):
        if p in ("1-URGENT", "2-HIGH"):
            return 0
        if p == "3-MEDIUM":
            return 1
        return 2

    o["b"] = o["o_orderpriority"].map(bucket)
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    n = np.zeros((3, 3), dtype=np.int64)
    for _, g in o.groupby("o_custkey"):
        bs = g["b"].to_numpy()
        for a, b in zip(bs[:-1], bs[1:]):
            n[a, b] += 1
    d = n.sum(axis=1) - n.sum(axis=0)
    s = np.zeros((2, 2))
    for i in range(2):
        s[i, i] = n.sum(axis=1)[i] + n.sum(axis=0)[i] - 2 * n[i, i]
    s[0, 1] = s[1, 0] = -(n[0, 1] + n[1, 0])
    chi2 = float(d[:2] @ np.linalg.inv(s) @ d[:2])
    [r] = stuart_maxwell_priority(spark, SF_DIR).collect()
    assert r["n_transitions"] == int(n.sum())
    assert (r["d0"], r["d1"]) == (d[0], d[1])
    assert abs(r["chi2"] - chi2) < 1e-6
    assert abs(r["chi2_num"] / r["chi2_den"] - chi2) < 1e-9
    assert abs(r["p_value"] - math.exp(-chi2 / 2)) < 1e-6


def test_lda_matches_numpy(spark):
    from zoom_spark.queries.round10b_ops import lda_urgent_classifier

    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_acctbal"
    ).toPandas()
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderpriority"
    ).toPandas()
    counts = o.groupby("o_custkey").size()
    urgent = set(o.loc[o["o_orderpriority"] == "1-URGENT", "o_custkey"])
    c["x1"] = (c["c_acctbal"] * 100 + 0.5).apply(math.floor).astype("int64")
    c["x2"] = c["c_custkey"].map(counts).fillna(0).astype("int64")
    c["y"] = c["c_custkey"].isin(urgent).astype(int)
    x = c[["x1", "x2"]].to_numpy(dtype=np.float64)
    y = c["y"].to_numpy()
    mu1 = x[y == 1].mean(axis=0)
    mu0 = x[y == 0].mean(axis=0)
    n1, n0 = int(y.sum()), int((1 - y).sum())
    cov = (
        np.cov(x[y == 1].T, bias=False) * (n1 - 1)
        + np.cov(x[y == 0].T, bias=False) * (n0 - 1)
    ) / (n1 + n0 - 2)
    w = np.linalg.inv(cov) @ (mu1 - mu0)
    thr = 0.5 * w @ (mu1 + mu0) - math.log(n1 / n0)
    yhat = (x @ w > thr).astype(int)
    tp = int(((y == 1) & (yhat == 1)).sum())
    fp = int(((y == 0) & (yhat == 1)).sum())
    fn = int(((y == 1) & (yhat == 0)).sum())
    tn = int(((y == 0) & (yhat == 0)).sum())
    [r] = lda_urgent_classifier(spark, SF_DIR).collect()
    assert (r["n_customers"], r["n_pos"], r["n_neg"]) == (len(c), n1, n0)
    assert abs(r["w1_scaled"] - w[0] * 1e6) < 1e-3
    assert abs(r["w2"] - w[1]) < 1e-6
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
    assert abs(r["accuracy"] - (tp + tn) / len(c)) < 1e-6


def _daily_dollars(spark):
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype(
        "int64"
    )
    return (
        o.groupby(o["o_orderdate"].dt.normalize())["cents"].sum() // 100
    ).sort_index()


def test_turning_points_matches_python(spark):
    from zoom_spark.queries.round10b_ops import turning_points_revenue

    y = _daily_dollars(spark).to_numpy()
    n = len(y)
    t_count = sum(
        1
        for i in range(1, n - 1)
        if (y[i] > y[i - 1] and y[i] > y[i + 1])
        or (y[i] < y[i - 1] and y[i] < y[i + 1])
    )
    e = 2 * (n - 2) / 3
    z = (t_count - e) / math.sqrt((16 * n - 29) / 90)
    [r] = turning_points_revenue(spark, SF_DIR).collect()
    assert r["n_days"] == n
    assert r["n_turning"] == t_count
    assert abs(r["e_turning"] - e) < 1e-6
    assert abs(r["z_stat"] - z) < 1e-6


def test_bartels_rvn_matches_python(spark):
    from zoom_spark.queries.round10b_ops import bartels_rvn_revenue

    y = _daily_dollars(spark)
    r_ = y.rank(method="average").to_numpy()
    n = len(r_)
    rvn = ((r_[:-1] - r_[1:]) ** 2).sum() / ((r_ - r_.mean()) ** 2).sum()
    var = (
        4 * (n - 2) * (5 * n**2 - 2 * n - 9)
        / (5 * n * (n + 1) * (n - 1) ** 2)
    )
    z = (rvn - 2) / math.sqrt(var)
    [row] = bartels_rvn_revenue(spark, SF_DIR).collect()
    assert row["n_days"] == n
    # 2x-grid integers reproduce the float ratio exactly: rvn =
    # n*num4/den4n
    assert abs(row["n_days"] * row["num4"] / row["den4n"] - rvn) < 1e-9
    assert abs(row["rvn"] - rvn) < 1e-6
    assert abs(row["z_stat"] - z) < 1e-6


def test_xbar_r_matches_python(spark):
    from zoom_spark.queries.round10b_ops import (
        _XBAR_A2,
        _XBAR_D3,
        _XBAR_D4,
        _XBAR_N,
        xbar_r_control_chart,
    )

    y = _daily_dollars(spark).to_numpy()
    m = len(y) // _XBAR_N
    xbars, ranges = [], []
    for j in range(m):
        g = y[j * _XBAR_N : (j + 1) * _XBAR_N]
        xbars.append(g.mean())
        ranges.append(int(g.max() - g.min()))
    xbb = float(np.mean(xbars))
    rbar = float(np.mean(ranges))
    ucl_x, lcl_x = xbb + _XBAR_A2 * rbar, xbb - _XBAR_A2 * rbar
    ucl_r, lcl_r = _XBAR_D4 * rbar, _XBAR_D3 * rbar
    n_x = sum(1 for v in xbars if v > ucl_x or v < lcl_x)
    n_r = sum(1 for v in ranges if v > ucl_r or v < lcl_r)
    [r] = xbar_r_control_chart(spark, SF_DIR).collect()
    assert r["n_subgroups"] == m
    assert abs(r["xbar_bar"] - xbb) < 1e-3
    assert abs(r["r_bar"] - rbar) < 1e-3
    assert abs(r["ucl_x"] - ucl_x) < 1e-3
    assert abs(r["ucl_r"] - ucl_r) < 1e-3
    assert (r["n_x_ooc"], r["n_r_ooc"]) == (n_x, n_r)


def test_cronbach_matches_textbook(spark):
    from zoom_spark.queries.round10b_ops import cronbach_alpha_yearly_spend

    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).toPandas()
    c = load_table(spark, SF_DIR, "customer").select("c_custkey").toPandas()
    o["yr"] = o["o_orderdate"].dt.year
    o["h"] = (o["o_totalprice"] / 100).apply(math.floor).astype("int64")
    y0 = int(o["yr"].min())
    x = np.zeros((len(c), 3), dtype=np.int64)
    idx = {ck: i for i, ck in enumerate(c["c_custkey"])}
    for j in range(3):
        for ck, v in (
            o.loc[o["yr"] == y0 + j].groupby("o_custkey")["h"].sum().items()
        ):
            x[idx[ck], j] = v
    k = 3
    # textbook: population variances (the 1/n scale cancels)
    item_vars = x.var(axis=0, ddof=0).sum()
    total_var = x.sum(axis=1).var(ddof=0)
    alpha = k / (k - 1) * (1 - item_vars / total_var)
    [r] = cronbach_alpha_yearly_spend(spark, SF_DIR).collect()
    assert (r["n_subjects"], r["k_items"]) == (len(c), 3)
    assert abs(r["var_total_n"] - total_var) < 1e-2
    assert abs(r["var_items_n"] - item_vars) < 1e-2
    assert abs(r["alpha"] - alpha) < 1e-6


def test_spectral_entropy_matches_python(spark):
    from zoom_spark.queries.round10b_ops import (
        _SPEC_PERIODS,
        spectral_entropy_revenue,
    )

    y = _daily_dollars(spark).to_numpy(dtype=np.float64)
    n = len(y)
    s = y.sum()
    t = np.arange(n, dtype=np.float64)
    powers = {}
    for p in _SPEC_PERIODS:
        ang = 2 * math.pi * t / p
        centered = n * y - s
        c = np.floor(centered * np.cos(ang) + 0.5).sum()
        s_ = np.floor(centered * np.sin(ang) + 0.5).sum()
        powers[p] = c * c + s_ * s_
    ptot = sum(powers.values())
    h = sum(
        -pv / ptot * math.log(pv / ptot) for pv in powers.values() if pv > 0
    )
    dom = min(powers, key=lambda p: (-powers[p], p))
    [r] = spectral_entropy_revenue(spark, SF_DIR).collect()
    assert r["n_days"] == n
    assert r["dominant_period"] == dom
    assert abs(r["spectral_entropy"] - h) < 1e-5
    assert abs(
        r["spectral_entropy_norm"] - h / math.log(len(_SPEC_PERIODS))
    ) < 1e-5
    assert 0 <= r["spectral_entropy_norm"] <= 1


def test_dfa_matches_python(spark):
    from zoom_spark.queries.round10b_ops import _DFA_BOXES, dfa_alpha_revenue

    y = _daily_dollars(spark).to_numpy(dtype=np.float64)
    n = len(y)
    prof = np.floor(
        (np.cumsum(y) * n - np.arange(1, n + 1) * y.sum()) / (1000.0 * n)
    )
    fs = {}
    for b in _DFA_BOXES:
        m = n // b
        rss_total = 0.0
        for j in range(m):
            z = prof[j * b : (j + 1) * b]
            i = np.arange(1, b + 1, dtype=np.float64)
            beta = ((i - i.mean()) * (z - z.mean())).sum() / (
                (i - i.mean()) ** 2
            ).sum()
            resid = z - z.mean() - beta * (i - i.mean())
            rss_total += math.floor((resid**2).sum() * 1e3 + 0.5) / 1e3
        fs[b] = math.sqrt(rss_total / (m * b))
    lx = np.log(np.array(list(_DFA_BOXES), dtype=np.float64))
    ly = np.log(np.array([fs[b] for b in _DFA_BOXES]))
    alpha = ((lx - lx.mean()) * (ly - ly.mean())).sum() / (
        (lx - lx.mean()) ** 2
    ).sum()
    [r] = dfa_alpha_revenue(spark, SF_DIR).collect()
    assert r["n_days"] == n
    for b in _DFA_BOXES:
        assert abs(r[f"f{b}"] - fs[b]) < 1e-3
    assert abs(r["dfa_alpha"] - alpha) < 1e-3
    # daily totals are noise-like: alpha should sit well below the
    # random-walk regime
    assert 0.0 < r["dfa_alpha"] < 1.5


def test_higuchi_matches_python(spark):
    from zoom_spark.queries.round10b_ops import (
        _HIGUCHI_KMAX,
        higuchi_fd_revenue,
    )

    y = _daily_dollars(spark).to_numpy(dtype=np.float64)
    n = len(y)
    ls = {}
    for k in range(1, _HIGUCHI_KMAX + 1):
        lm6 = 0
        for m in range(1, k + 1):
            idx = np.arange(m - 1, n, k)
            if len(idx) < 2:
                continue
            s = np.abs(np.diff(y[idx])).sum()
            q = len(idx) - 1
            lm6 += math.floor(s * (n - 1) / (q * k * k) * 1e6 + 0.5)
        ls[k] = lm6 / 1e6 / k
    lx = np.log(1.0 / np.arange(1, _HIGUCHI_KMAX + 1))
    ly = np.log(np.array([ls[k] for k in range(1, _HIGUCHI_KMAX + 1)]))
    fd = ((lx - lx.mean()) * (ly - ly.mean())).sum() / (
        (lx - lx.mean()) ** 2
    ).sum()
    [r] = higuchi_fd_revenue(spark, SF_DIR).collect()
    assert r["n_days"] == n
    assert abs(r["l1"] - ls[1]) < 1e-3
    assert abs(r[f"l{_HIGUCHI_KMAX}"] - ls[_HIGUCHI_KMAX]) < 1e-3
    assert abs(r["higuchi_fd"] - fd) < 1e-3
    # a noisy series has FD near the plane-filling limit; the
    # finite-sample estimator can slightly exceed 2 (2.0035 at
    # sf0.001) — bound with a small overshoot allowance
    assert 1.0 <= r["higuchi_fd"] <= 2.1


def test_ratio_regression_matches_python(spark):
    import hashlib

    from zoom_spark.queries.round10b_ops import ratio_regression_estimator

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    ).toPandas()
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).toPandas()
    qty = li.groupby("l_orderkey")["l_quantity"].sum().astype("int64")
    o = o[o["o_orderkey"].isin(qty.index)]
    o["y"] = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype("int64")
    o["x"] = o["o_orderkey"].map(qty)
    o["in_s"] = o["o_orderkey"].map(
        lambda k: hashlib.md5(str(k).encode()).hexdigest()[0] < "4"
    )
    s = o[o["in_s"]]
    n_pop, n_s = len(o), len(s)
    ty, tx = int(o["y"].sum()), int(o["x"].sum())
    ht = n_pop / n_s * s["y"].sum()
    ratio = s["y"].sum() / s["x"].sum() * tx
    b = (
        n_s * (s["x"] * s["y"]).sum() - s["x"].sum() * s["y"].sum()
    ) / (n_s * (s["x"] ** 2).sum() - s["x"].sum() ** 2)
    reg = n_pop * (
        s["y"].mean() + b * (tx / n_pop - s["x"].mean())
    )
    [r] = ratio_regression_estimator(spark, SF_DIR).collect()
    assert (r["n_pop"], r["n_s"]) == (n_pop, n_s)
    assert r["true_total_cents"] == ty
    assert abs(r["ht_est"] - ht) < 1
    assert abs(r["ratio_est"] - ratio) < 1
    assert abs(r["reg_est"] - reg) < max(1, 1e-9 * abs(reg))
    # error fields must agree with their estimators (no independent
    # data claim: at sf0.001 quantity is a WEAK auxiliary and the
    # ratio estimator legitimately loses to HT)
    assert abs(r["ht_err_bp"] - round(abs(ht - ty) / ty * 1e4, 2)) < 0.02
    assert (
        abs(r["ratio_err_bp"] - round(abs(ratio - ty) / ty * 1e4, 2)) < 0.02
    )


def test_basket_rule_metrics_matches_python(spark):
    import collections
    import itertools

    from zoom_spark.queries.round10b_ops import (
        _RULE_TOPK,
        basket_rule_metrics,
    )

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).toPandas()
    p = load_table(spark, SF_DIR, "part").select(
        "p_partkey", "p_brand"
    ).toPandas()
    m = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    baskets = m.groupby("l_orderkey")["p_brand"].agg(set)
    n = len(baskets)
    item_c = collections.Counter()
    pair_c = collections.Counter()
    for items in baskets:
        for it in items:
            item_c[it] += 1
        for x, y_ in itertools.permutations(items, 2):
            pair_c[(x, y_)] += 1
    top = sorted(pair_c.items(), key=lambda kv: (-kv[1], kv[0]))[:_RULE_TOPK]
    expect = {}
    for (ante, cons), c in top:
        sa, sb, sab = item_c[ante] / n, item_c[cons] / n, c / n
        conf = c / item_c[ante]
        lev = sab - sa * sb
        expect[(ante, cons)] = (
            c,
            round(conf, 6),
            round((1 - sb) / (1 - conf), 6),
            round(lev, 6),
            round(lev / max(sab * (1 - sa), sa * (sb - sab)), 6),
            round(c / (item_c[ante] + item_c[cons] - c), 6),
        )
    got = {
        (r["ante"], r["cons"]): (
            r["n_both"],
            r["confidence"],
            r["conviction"],
            r["leverage"],
            r["zhang"],
            r["jaccard"],
        )
        for r in basket_rule_metrics(spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        for a, b in zip(got[k], expect[k]):
            assert abs(a - b) < 2e-6, (k, got[k], expect[k])


def test_gwet_ac1_matches_textbook(spark):
    from zoom_spark.queries.round10b_ops import gwet_ac1_orders

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    ).toPandas()
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    ).toPandas()
    li["gross"] = (li["l_extendedprice"] * 100 + 0.5).apply(
        math.floor
    ).astype("int64")
    g = li.groupby("l_orderkey").agg(
        gross=("gross", "sum"), qty=("l_quantity", "sum")
    )
    m = o.merge(g, left_on="o_orderkey", right_index=True)
    c1 = np.where(
        m["o_totalprice"] < 77000, 0, np.where(m["o_totalprice"] < 150000, 1, 2)
    )
    c2 = np.where(m["gross"] < 7500000, 0, np.where(m["gross"] < 14500000, 1, 2))
    c3 = np.where(m["qty"] < 60, 0, np.where(m["qty"] < 120, 1, 2))
    n = len(m)
    ratings = np.stack([c1, c2, c3], axis=1)
    # textbook AC1: Pa from pairwise agreement, Pe = sum pi(1-pi)/(k-1)
    pa = np.mean(
        [
            sum(a == b for a, b in [(r[0], r[1]), (r[0], r[2]), (r[1], r[2])])
            / 3
            for r in ratings
        ]
    )
    pis = [np.mean(ratings == q) for q in (0, 1, 2)]
    pe = sum(p_ * (1 - p_) for p_ in pis) / 2
    ac1 = (pa - pe) / (1 - pe)
    [r] = gwet_ac1_orders(spark, SF_DIR).collect()
    assert r["n_items"] == n
    assert abs(r["p_a"] - pa) < 1e-6
    assert abs(r["p_e_gwet"] - pe) < 1e-6
    assert abs(r["ac1"] - ac1) < 1e-5


def test_price_elasticity_matches_numpy(spark):
    from zoom_spark.queries.round10b_ops import price_elasticity_loglog

    p = load_table(spark, SF_DIR, "part").select(
        "p_partkey", "p_retailprice"
    ).toPandas()
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_quantity"
    ).toPandas()
    q = li.groupby("l_partkey")["l_quantity"].sum().astype("int64")
    p = p[p["p_partkey"].isin(q.index)].copy()
    p["pc"] = (p["p_retailprice"] * 100 + 0.5).apply(math.floor).astype(
        "int64"
    )
    lp = np.log(p["pc"].to_numpy(dtype=np.float64))
    lq = np.log(p["p_partkey"].map(q).to_numpy(dtype=np.float64))
    slope, intercept = np.polyfit(lp, lq, 1)
    r2 = np.corrcoef(lp, lq)[0, 1] ** 2
    [r] = price_elasticity_loglog(spark, SF_DIR).collect()
    assert r["n_parts"] == len(p)
    assert abs(r["elasticity"] - slope) < 1e-4
    assert abs(r["intercept"] - intercept) < 1e-3
    assert abs(r["r2"] - r2) < 1e-4


def test_process_rework_matches_python(spark):
    from zoom_spark.queries.round10b_ops import process_rework_report

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).toPandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    expect = {}
    for et, g in ev.groupby("event_type"):
        n_events = len(g)
        n_users = g["user_id"].nunique()
        expect[et] = [n_events, n_users, n_events - n_users, 0]
    for _, g in ev.groupby("user_id"):
        ts = g["event_type"].to_numpy()
        for a, b in zip(ts[:-1], ts[1:]):
            if a == b:
                expect[b][3] += 1
    got = {
        r["event_type"]: [
            r["n_events"],
            r["n_users"],
            r["n_rework"],
            r["n_selfloops"],
        ]
        for r in process_rework_report(spark, SF_DIR).collect()
    }
    assert got == expect


def test_kendall_tau_b_matches_python(spark):
    from zoom_spark.queries.round10b_ops import kendall_tau_b_priority_value

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    x = o["o_orderpriority"].str[0].astype(int).to_numpy()
    y = np.minimum(9, (o["o_totalprice"] / 55000).apply(math.floor)).astype(
        int
    ).to_numpy()
    # textbook grouped tau-b from the full contingency table
    import collections

    cells = collections.Counter(zip(x, y))
    cc = dd = 0
    items = list(cells.items())
    for i, ((xa, ya), ca) in enumerate(items):
        for (xb, yb), cb in items[i + 1 :]:
            if (xa < xb and ya < yb) or (xa > xb and ya > yb):
                cc += ca * cb
            elif (xa < xb and ya > yb) or (xa > xb and ya < yb):
                dd += ca * cb
    n = len(o)
    n0 = n * (n - 1) // 2
    n1 = sum(
        t * (t - 1) // 2 for t in collections.Counter(x).values()
    )
    n2 = sum(
        t * (t - 1) // 2 for t in collections.Counter(y).values()
    )
    tau_b = (cc - dd) / math.sqrt((n0 - n1) * (n0 - n2))
    [r] = kendall_tau_b_priority_value(spark, SF_DIR).collect()
    assert r["n_orders"] == n
    assert (r["concordant"], r["discordant"]) == (cc, dd)
    assert (r["ties_x"], r["ties_y"]) == (n1, n2)
    assert abs(r["tau_b"] - tau_b) < 1e-6


def test_hodges_lehmann_matches_python(spark):
    from zoom_spark.queries.round10b_ops import hodges_lehmann_weekend_shift

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype(
        "int64"
    )
    d = (
        o.groupby(o["o_orderdate"].dt.normalize())["cents"].sum() // 100
    ).sort_index()
    anchor = pd.Timestamp("1990-01-01")
    wk = ((d.index - anchor).days % 7).isin([5, 6])
    we = d[wk].to_numpy()
    wd = d[~wk].to_numpy()
    diffs = np.sort((we[:, None] - wd[None, :]).ravel())
    m = len(diffs)
    hl2 = int(diffs[(m + 1) // 2 - 1] + diffs[m // 2])
    [r] = hodges_lehmann_weekend_shift(spark, SF_DIR).collect()
    assert (r["n_weekend"], r["n_weekday"]) == (len(we), len(wd))
    assert r["n_pairs"] == m
    assert r["hl2"] == hl2
    assert abs(r["hl_shift"] - hl2 / 2) < 0.051


def test_zip_moment_fit_matches_python(spark):
    from zoom_spark.queries.round10b_ops import zip_moment_fit_events

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts"
    ).toPandas()
    wk = ev["ts"].dt.to_period("W").dt.start_time
    w0 = wk.min()
    ev["wk"] = ((wk - w0).dt.days // 7).astype(int)
    n_weeks = int(ev["wk"].max()) + 1
    users = ev["user_id"].unique()
    counts = np.zeros((len(users), n_weeks), dtype=np.int64)
    uix = {u: i for i, u in enumerate(users)}
    for (u, w), c in ev.groupby(["user_id", "wk"]).size().items():
        counts[uix[u], w] = c
    flat = counts.ravel()
    n = len(flat)
    mean = flat.mean()
    var = flat.var(ddof=1)
    lam = (var + mean**2 - mean) / mean
    pi = (lam - mean) / lam
    [r] = zip_moment_fit_events(spark, SF_DIR).collect()
    assert r["n_cells"] == n
    assert r["n_zero_cells"] == int((flat == 0).sum())
    assert abs(r["mean_c"] - mean) < 1e-6
    assert abs(r["var_c"] - var) < 1e-6
    assert abs(r["lambda_hat"] - lam) < 1e-5
    assert abs(r["pi_hat"] - pi) < 1e-5
    # moment fit must put lambda above the observed mean when
    # zero-inflated (var > mean)
    if var > mean:
        assert r["lambda_hat"] > r["mean_c"]


def test_lognormal_fit_matches_numpy(spark):
    from zoom_spark.queries.round10b_ops import lognormal_fit_spend

    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype(
        "int64"
    )
    spend = o.groupby("o_custkey")["cents"].sum()
    spend = spend[spend > 0].to_numpy(dtype=np.float64)
    lx = np.log(spend)
    mu = lx.mean()
    sigma = lx.std(ddof=1)
    [r] = lognormal_fit_spend(spark, SF_DIR).collect()
    assert r["n_customers"] == len(spend)
    assert abs(r["mu"] - mu) < 1e-5
    assert abs(r["sigma"] - sigma) < 1e-5
    assert abs(r["median_fit_dollars"] - math.exp(mu) / 100) < 0.5
    assert abs(
        r["mean_fit_dollars"] - math.exp(mu + sigma**2 / 2) / 100
    ) < 0.5
    assert abs(r["mean_obs_dollars"] - spend.mean() / 100) < 0.5
    # log-normal fitted mean must exceed fitted median (sigma > 0)
    assert r["mean_fit_dollars"] > r["median_fit_dollars"]


def test_degree_centralization_matches_python(spark):
    from zoom_spark.queries.round10b_ops import (
        degree_centralization_copurchase,
    )

    nbr = _copurchase_nbrs(spark, 1)
    degs = sorted((len(v), k) for k, v in nbr.items())
    n = len(degs)
    ds = [d for d, _ in degs]
    sd = sum(ds)
    dmax = max(ds)
    centralization = (n * dmax - sd) / ((n - 1) * (n - 2))
    gini = sum((2 * (i + 1) - n - 1) * d for i, d in enumerate(ds)) / (
        n * sd
    )
    [r] = degree_centralization_copurchase(spark, SF_DIR).collect()
    assert r["n_nodes"] == n
    assert r["n_edges"] == sd // 2
    assert r["max_degree"] == dmax
    assert abs(r["mean_degree"] - sd / n) < 1e-3
    assert abs(r["centralization"] - centralization) < 1e-6
    assert abs(r["degree_gini"] - gini) < 1e-6


def test_gehan_breslow_matches_python(spark):
    from zoom_spark.queries.round10b_ops import gehan_breslow_conversion
    from zoom_spark.queries.survival import _spells

    sp = _spells(spark, SF_DIR).toPandas()
    # textbook Gehan-Breslow: weight each event time by total at risk
    times = sorted(sp.loc[sp["converted"] == 1, "t"].unique())
    num = 0.0
    var = 0.0
    wo1 = 0
    we6 = 0
    wv6 = 0
    for t in times:
        at_risk = sp[sp["t"] >= t]
        n = len(at_risk)
        n1 = int((at_risk["grp"] == 1).sum())
        ev = sp[(sp["t"] == t) & (sp["converted"] == 1)]
        d_all = len(ev)
        d1 = int((ev["grp"] == 1).sum())
        e1 = d_all * n1 / n
        v = (
            d_all * (n1 / n) * (1 - n1 / n) * (n - d_all) / max(n - 1, 1)
            if n > 1
            else 0.0
        )
        num += n * (d1 - e1)
        var += n * n * v
        wo1 += n * d1
        we6 += math.floor(n * e1 * 1e6 + 0.5)
        wv6 += math.floor(n * n * v * 1e6 + 0.5)
    [r] = gehan_breslow_conversion(spark, SF_DIR).collect()
    assert r["w_observed_1"] == wo1
    assert abs(r["w_expected_1"] - we6 / 1e6) < 1e-3
    assert abs(r["z_stat"] - (wo1 - we6 / 1e6) / math.sqrt(wv6 / 1e6)) < 1e-5
    # and the snapped z must track the unsnapped textbook z closely
    assert abs(r["z_stat"] - num / math.sqrt(var)) < 1e-3


def _as_phi(z):
    """A-S 7.1.26 normal CDF, the engine's spelling."""
    x = abs(z) / math.sqrt(2.0)
    t = 1.0 / (1.0 + 0.3275911 * x)
    a = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    poly = sum(c * t ** (i + 1) for i, c in enumerate(a))
    erf = 1.0 - poly * math.exp(-x * x)
    return 0.5 * (1.0 + (1.0 if z >= 0 else -1.0) * erf)


def test_lilliefors_matches_python(spark):
    from zoom_spark.queries.round10b_ops import lilliefors_lognormal_spend

    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype(
        "int64"
    )
    spend = o.groupby("o_custkey")["cents"].sum()
    spend = np.sort(spend[spend > 0].to_numpy(dtype=np.float64))
    lx = np.log(spend)
    n = len(lx)
    mu, sigma = lx.mean(), lx.std(ddof=1)
    d = 0.0
    for i, v in enumerate(lx):
        phi = _as_phi((v - mu) / sigma)
        d = max(d, abs(phi - (i + 1) / n), abs(phi - i / n))
    [r] = lilliefors_lognormal_spend(spark, SF_DIR).collect()
    assert r["n_customers"] == n
    assert abs(r["mu"] - mu) < 1e-5
    assert abs(r["sigma"] - sigma) < 1e-5
    assert abs(r["ks_d"] - d) < 1e-5
    assert abs(
        r["lilliefors_stat"]
        - d * (math.sqrt(n) - 0.01 + 0.85 / math.sqrt(n))
    ) < 1e-4


def test_tukey_biweight_matches_python(spark):
    from zoom_spark.queries.round10b_ops import tukey_biweight_location

    o = load_table(spark, SF_DIR, "orders").select("o_totalprice").toPandas()
    x = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype(
        "int64"
    ).to_numpy()
    xs = np.sort(x)
    n = len(xs)
    med = (xs[(n + 1) // 2 - 1] + xs[n // 2]) / 2.0
    dev = np.sort(np.abs(x - med))
    mad = (dev[(n + 1) // 2 - 1] + dev[n // 2]) / 2.0
    u = (x - med) / (9 * mad)
    mask = np.abs(u) < 1
    w = (1 - u[mask] ** 2) ** 2
    biweight = (w * x[mask]).sum() / w.sum()
    [r] = tukey_biweight_location(spark, SF_DIR).collect()
    assert r["n_orders"] == n
    assert abs(r["median_dollars"] - med / 100) < 0.01
    assert abs(r["mad_dollars"] - mad / 100) < 0.01
    assert abs(r["biweight_dollars"] - biweight / 100) < 0.01
    assert abs(r["mean_dollars"] - x.mean() / 100) < 0.01
    # the M-estimator must land inside the bulk: within one MAD of
    # the median (order totals are near-symmetric, so no skew claim)
    assert abs(r["biweight_dollars"] - r["median_dollars"]) <= r[
        "mad_dollars"
    ]


def test_james_stein_matches_python(spark):
    from zoom_spark.queries.round10b_ops import james_stein_nation_means

    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype(
        "int64"
    )
    spend = o.groupby("o_custkey")["cents"].sum()
    c["cents"] = c["c_custkey"].map(spend).fillna(0).astype("int64")
    g = c.groupby("c_nationkey")["cents"]
    means = {k: round(v * 1e6) / 1e6 for k, v in g.mean().items()}
    k = len(means)
    gm = sum(means.values()) / k
    s_stat = sum(math.floor((m - gm) ** 2 + 0.5) for m in means.values())
    # engine computes the within variance on the whole-dollar grid
    gd = c.assign(d=(c["cents"] // 100)).groupby("c_nationkey")["d"]
    ssw = sum(((grp - grp.mean()) ** 2).sum() for _, grp in gd) * 1e4
    df_w = len(c) - k
    sig2_mean = (ssw / df_w) / (len(c) / k)
    factor = max(0.0, 1 - (k - 3) * sig2_mean / s_stat)
    rows = james_stein_nation_means(spark, SF_DIR).collect()
    assert len(rows) == k
    for r in rows:
        m = means[r["nation"]]
        assert abs(r["raw_mean_dollars"] - m / 100) < 1e-3
        assert abs(r["shrink_factor"] - factor) < 1e-5
        expect = (gm + factor * (m - gm)) / 100
        assert abs(r["js_mean_dollars"] - expect) < 1e-3
        # shrinkage moves every estimate strictly toward the grand mean
        lo, hi = sorted((m / 100, gm / 100))
        assert lo - 1e-3 <= r["js_mean_dollars"] <= hi + 1e-3


def test_longest_streaks_matches_python(spark):
    from zoom_spark.queries.round10b_ops import longest_streaks_revenue

    y = _daily_dollars(spark).to_numpy()
    n = len(y)
    ys = np.sort(y)
    med2 = int(ys[(n + 1) // 2 - 1] + ys[n // 2])

    def longest(flags):
        best = cur = 0
        for f in flags:
            cur = cur + 1 if f else 0
            best = max(best, cur)
        return best

    up = [y[i] > y[i - 1] for i in range(1, n)]
    dn = [y[i] < y[i - 1] for i in range(1, n)]
    hi = [2 * v > med2 for v in y]
    [r] = longest_streaks_revenue(spark, SF_DIR).collect()
    assert r["n_days"] == n
    assert abs(r["median_dollars"] - med2 / 2) < 0.051
    assert r["longest_up_streak"] == longest(up)
    assert r["longest_down_streak"] == longest(dn)
    assert r["longest_above_median_streak"] == longest(hi)


def test_oaxaca_matches_numpy(spark):
    from zoom_spark.queries.round10b_ops import oaxaca_gap_decomposition

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).toPandas()
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).toPandas()
    agg = li.groupby("l_orderkey").agg(
        x1=("l_quantity", "size"), x2=("l_quantity", "sum")
    )
    m = o.merge(agg, left_on="o_orderkey", right_index=True)
    m["y"] = (m["o_totalprice"] * 100 + 0.5).apply(math.floor).astype(
        "int64"
    )
    m["g"] = (m["o_orderpriority"] == "1-URGENT").astype(int)
    stats = {}
    for g, grp in m.groupby("g"):
        x = grp[["x1", "x2"]].to_numpy(dtype=np.float64)
        yv = grp["y"].to_numpy(dtype=np.float64)
        xc = x - x.mean(axis=0)
        yc = yv - yv.mean()
        beta = np.linalg.solve(xc.T @ xc, xc.T @ yc)
        stats[g] = (len(grp), x.mean(axis=0), yv.mean(), beta)
    n1, mx1v, my1, _ = stats[1]
    n0, mx0v, my0, beta0 = stats[0]
    gap = my1 - my0
    explained = float(beta0 @ (mx1v - mx0v))
    [r] = oaxaca_gap_decomposition(spark, SF_DIR).collect()
    assert (r["n_urgent"], r["n_other"]) == (n1, n0)
    assert abs(r["gap_dollars"] - gap / 100) < 1e-2
    assert abs(r["explained_dollars"] - explained / 100) < 1e-2
    assert abs(
        r["unexplained_dollars"] - (gap - explained) / 100
    ) < 1e-2
    assert abs(r["beta_lines_other"] - beta0[0] / 100) < 1e-3
    assert abs(r["beta_qty_other"] - beta0[1] / 100) < 1e-3
    # identity: gap == explained + unexplained on the reported grid
    assert abs(
        r["gap_dollars"]
        - (r["explained_dollars"] + r["unexplained_dollars"])
    ) < 2e-4


def test_beta_binomial_matches_python(spark):
    from zoom_spark.queries.round10b_ops import beta_binomial_shrinkage

    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderpriority"
    ).toPandas()
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    m["u"] = (m["o_orderpriority"] == "1-URGENT").astype(int)
    g = m.groupby("c_nationkey").agg(n=("u", "size"), k=("u", "sum"))
    # replay the engine's 1e-9 rate snap, then textbook MoM
    p = np.array(
        [math.floor(k / n * 1e9 + 0.5) / 1e9 for n, k in zip(g["n"], g["k"])]
    )
    mu = p.mean()
    v = p.var(ddof=1)
    common = mu * (1 - mu) / v - 1
    alpha, beta = mu * common, (1 - mu) * common
    rows = beta_binomial_shrinkage(spark, SF_DIR).collect()
    assert len(rows) == len(g)
    for r in rows:
        n, k = int(g.loc[r["nation"], "n"]), int(g.loc[r["nation"], "k"])
        assert (r["n_orders"], r["k_urgent"]) == (n, k)
        assert abs(r["raw_rate"] - k / n) < 1e-6
        assert abs(r["alpha"] - alpha) < 1e-3
        assert abs(r["beta"] - beta) < 1e-3
        assert abs(
            r["shrunk_rate"] - (k + alpha) / (n + alpha + beta)
        ) < 1e-5
        # shrinkage bounds: posterior mean between raw rate and mu
        lo, hi = sorted((k / n, mu))
        assert lo - 1e-6 <= r["shrunk_rate"] <= hi + 1e-6


def test_pass_at_k_matches_python(spark):
    from math import comb

    from zoom_spark.queries.round10b_ops import pass_at_k_estimator

    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderpriority"
    ).toPandas()
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    m["u"] = (m["o_orderpriority"] == "1-URGENT").astype(int)
    g = m.groupby("c_nationkey").agg(n=("u", "size"), cc=("u", "sum"))
    rows = pass_at_k_estimator(spark, SF_DIR).collect()
    assert len(rows) == len(g)
    for r in rows:
        n, cc = int(g.loc[r["task"], "n"]), int(g.loc[r["task"], "cc"])
        assert (r["n_trials"], r["n_correct"]) == (n, cc)
        for k in (1, 5, 10):
            got = r[f"pass_at_{k}"]
            if n < k:
                assert got is None
            else:
                # textbook: 1 - C(n-c, k)/C(n, k) via exact binomials
                expect = 1.0 - comb(n - cc, k) / comb(n, k)
                assert abs(got - expect) < 1e-6, (r["task"], k)
        # monotone in k
        if r["pass_at_10"] is not None:
            assert (
                r["pass_at_1"] <= r["pass_at_5"] + 1e-9
                and r["pass_at_5"] <= r["pass_at_10"] + 1e-9
            )


def test_tokenizer_fertility_matches_python(spark):
    import re

    from zoom_spark.queries.round10b_ops import tokenizer_fertility_by_lang
    from zoom_spark.functions.text import BPE_ISH_PATTERN

    docs = load_table(spark, SF_DIR, "documents").select(
        "lang", "text"
    ).toPandas()
    expect = {}
    for lang, g in docs.groupby("lang"):
        ws = sum(
            len([w for w in re.split(r"\s+", t.strip().lower()) if w])
            for t in g["text"]
        )
        bpe = sum(len(re.findall(BPE_ISH_PATTERN, t)) for t in g["text"])
        chars = sum(len(t) for t in g["text"])
        expect[lang] = (len(g), ws, bpe, chars)
    rows = tokenizer_fertility_by_lang(spark, SF_DIR).collect()
    assert {r["lang"] for r in rows} == set(expect)
    for r in rows:
        nd, ws, bpe, chars = expect[r["lang"]]
        assert (
            r["n_docs"],
            r["n_ws_tokens"],
            r["n_bpeish_tokens"],
            r["n_chars"],
        ) == (nd, ws, bpe, chars)
        assert abs(r["fertility"] - bpe / ws) < 1e-6
        assert abs(r["chars_per_token"] - chars / bpe) < 1e-6
        # subword fertility is >= 1 by construction (BPE-ish splits
        # never merge across whitespace)
        assert r["fertility"] >= 1.0


def test_welch_anova_matches_python(spark):
    from zoom_spark.queries.round10b_ops import welch_anova_segments

    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment"
    ).toPandas()
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype(
        "int64"
    )
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    g = m.groupby(["c_mktsegment", "c_custkey"])["cents"].sum().reset_index()
    k = g["c_mktsegment"].nunique()
    wj, xb, nj = [], [], []
    for _, grp in g.groupby("c_mktsegment"):
        x = grp["cents"].to_numpy(dtype=np.float64)
        # engine computes the variance on the whole-dollar grid
        d = np.floor(x / 100)
        var = d.var(ddof=1) * 1e4
        wj.append(len(x) / var)
        xb.append(x.mean())
        nj.append(len(x))
    wj, xb, nj = np.array(wj), np.array(xb), np.array(nj)
    wsum = wj.sum()
    xt = (wj * xb).sum() / wsum
    num = (wj * (xb - xt) ** 2).sum() / (k - 1)
    lam = ((1 - wj / wsum) ** 2 / (nj - 1)).sum()
    f = num / (1 + 2 * (k - 2) / (k**2 - 1) * lam)
    df2 = (k**2 - 1) / (3 * lam)
    [r] = welch_anova_segments(spark, SF_DIR).collect()
    assert (r["k"], r["df1"]) == (k, k - 1)
    assert abs(r["df2"] - df2) < 1e-2
    assert abs(r["welch_f"] - f) < 1e-4


def _trend_resid(spark):
    d = _daily_dollars(spark)
    y = d.to_numpy(dtype=np.float64)
    t = np.arange(1, len(y) + 1, dtype=np.float64)
    n = len(y)
    b = (n * (t * y).sum() - t.sum() * y.sum()) / (
        n * (t * t).sum() - t.sum() ** 2
    )
    a = (y.sum() - b * t.sum()) / n
    return t, np.floor(y - a - b * t + 0.5)


def test_breusch_godfrey_matches_numpy(spark):
    from zoom_spark.queries.round10b_ops import breusch_godfrey_revenue

    t, e = _trend_resid(spark)
    # aux regression e_t on [1, t, e_{t-1}]
    yv = e[1:]
    x = np.column_stack([np.ones(len(yv)), t[1:], e[:-1]])
    beta, *_ = np.linalg.lstsq(x, yv, rcond=None)
    fitted = x @ beta
    ssr = ((fitted - yv.mean()) ** 2).sum()
    sst = ((yv - yv.mean()) ** 2).sum()
    r2 = ssr / sst
    n = len(yv)
    [r] = breusch_godfrey_revenue(spark, SF_DIR).collect()
    assert r["n_obs"] == n
    assert abs(r["r2_aux"] - r2) < 1e-5
    assert abs(r["lm_stat"] - n * r2) < 1e-2
    assert abs(r["p_exp_df2_bound"] - math.exp(-n * r2 / 2)) < 1e-5


def test_white_test_matches_numpy(spark):
    from zoom_spark.queries.round10b_ops import white_test_revenue

    t, e = _trend_resid(spark)
    e4 = np.floor(e / 1e4 + 0.5)
    yv = e4 * e4
    x = np.column_stack([np.ones(len(yv)), t, t * t])
    beta, *_ = np.linalg.lstsq(x, yv, rcond=None)
    fitted = x @ beta
    r2 = ((fitted - yv.mean()) ** 2).sum() / ((yv - yv.mean()) ** 2).sum()
    n = len(yv)
    [r] = white_test_revenue(spark, SF_DIR).collect()
    assert r["n_obs"] == n
    assert abs(r["r2_aux"] - r2) < 1e-5
    assert abs(r["lm_stat"] - n * r2) < 1e-2
    assert abs(r["p_value"] - math.exp(-n * r2 / 2)) < 1e-5


def test_scheirer_ray_hare_matches_python(spark):
    from zoom_spark.queries.round10b_ops import scheirer_ray_hare_test

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_orderpriority", "o_totalprice"
    ).toPandas()
    anchor = pd.Timestamp("1990-01-01")
    wd = ((o["o_orderdate"].dt.normalize() - anchor).dt.days % 7).astype(int)

    def bucket(p):
        if p in ("1-URGENT", "2-HIGH"):
            return 0
        if p == "3-MEDIUM":
            return 1
        return 2

    pb = o["o_orderpriority"].map(bucket)
    cents = (o["o_totalprice"] * 100 + 0.5).apply(math.floor).astype("int64")
    ranks = pd.Series(cents).rank(method="average").to_numpy()
    n = len(o)
    df = pd.DataFrame({"wd": wd, "pb": pb, "r": ranks})
    # textbook SRH: SS on ranks / MS_total(ranks); compare against
    # the engine's H values (the engine works on the 2x grid and
    # unit-snaps T^2/m — ~1e-14 relative, invisible here)
    ms = df["r"].var(ddof=1)
    grand = df["r"].sum()

    def ss(groupcols):
        g = df.groupby(groupcols)["r"].agg(["sum", "size"])
        return (g["sum"] ** 2 / g["size"]).sum() - grand**2 / n

    h_a = ss("wd") / ms
    h_b = ss("pb") / ms
    h_ab = (ss(["wd", "pb"]) - ss("wd") - ss("pb")) / ms + 0.0
    [r] = scheirer_ray_hare_test(spark, SF_DIR).collect()
    assert r["n_orders"] == n
    assert abs(r["h_weekday"] - h_a) < 1e-4
    assert abs(r["h_priority"] - h_b) < 1e-4
    assert abs(r["h_interaction"] - h_ab) < 1e-4
    assert (r["df_weekday"], r["df_priority"], r["df_interaction"]) == (
        6,
        2,
        12,
    )
    assert abs(r["p_priority"] - math.exp(-h_b / 2)) < 1e-5

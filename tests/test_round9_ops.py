"""Referees for the round-9 operators (R327+): independent
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


def _events():
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _orders():
    return pd.read_parquet(f"{SF_DIR}/orders.parquet")


def _weekend_split():
    ev = _events()
    days = (
        pd.to_datetime(ev["ts"]).dt.normalize()
        - pd.Timestamp("2024-01-01")
    ).dt.days % 7
    wk = ev["value"][days.isin([5, 6])].to_numpy()
    wd = ev["value"][~days.isin([5, 6])].to_numpy()
    return wk, wd


def test_cliffs_delta_matches_bruteforce(spark):
    from zoom_spark.queries.round9_ops import cliffs_delta_weekend

    wk, wd = _weekend_split()
    # O(m*n) brute force on the tiny fixture
    gt = sum((a > wd).sum() for a in wk)
    lt = sum((a < wd).sum() for a in wk)
    want = (gt - lt) / (len(wk) * len(wd))
    row = cliffs_delta_weekend(spark, SF_DIR).collect()[0]
    assert row["n_weekend"] == len(wk)
    assert row["n_weekday"] == len(wd)
    assert abs(row["cliffs_delta"] - want) < 1e-6


def test_gk_gamma_matches_bruteforce(spark):
    from zoom_spark.queries.round9_ops import gk_gamma_priority_price

    o = _orders()
    x = o["o_orderpriority"].str[0].astype(int).to_numpy()
    y = np.floor(o["o_totalprice"].to_numpy() / 50000.0).astype(np.int64)
    conc = disc = 0
    n = len(x)
    for i in range(n):
        dx = x[i + 1 :] - x[i]
        dy = y[i + 1 :] - y[i]
        s = dx * dy
        conc += int((s > 0).sum())
        disc += int((s < 0).sum())
    row = gk_gamma_priority_price(spark, SF_DIR).collect()[0]
    assert row["concordant"] == conc
    assert row["discordant"] == disc
    assert abs(row["gamma"] - (conc - disc) / (conc + disc)) < 1e-6


def test_theils_u_matches_entropy_decomposition(spark):
    from zoom_spark.queries.round9_ops import theils_u_status_priority

    o = _orders()
    n = len(o)
    py = o["o_orderstatus"].value_counts() / n
    hy = -sum(p * math.log(p) for p in py)
    hyx = 0.0
    for _, grp in o.groupby("o_orderpriority"):
        px = len(grp) / n
        pyx = grp["o_orderstatus"].value_counts() / len(grp)
        hyx += px * -sum(p * math.log(p) for p in pyx)
    row = theils_u_status_priority(spark, SF_DIR).collect()[0]
    assert abs(row["h_status"] - hy) < 1e-5
    assert abs(row["h_status_given_priority"] - hyx) < 1e-5
    assert abs(row["theils_u"] - (hy - hyx) / hy) < 1e-4
    assert 0.0 <= row["theils_u"] <= 1.0


def test_ccc_matches_numpy(spark):
    from zoom_spark.queries.round9_ops import concordance_corr_daily

    ev = _events()
    day = pd.to_datetime(ev["ts"]).dt.date
    g = ev.assign(day=day).groupby("day")["event_type"]
    x = g.apply(lambda s: (s == "purchase").sum()).to_numpy(float)
    y = g.apply(lambda s: (s == "click").sum()).to_numpy(float)
    vx, vy = x.var(), y.var()  # population
    cxy = ((x - x.mean()) * (y - y.mean())).mean()
    want_ccc = 2 * cxy / (vx + vy + (x.mean() - y.mean()) ** 2)
    want_r = cxy / math.sqrt(vx * vy)
    row = concordance_corr_daily(spark, SF_DIR).collect()[0]
    assert row["n_days"] == len(x)
    assert abs(row["ccc"] - want_ccc) < 1e-6
    assert abs(row["pearson_r"] - want_r) < 1e-6


def test_calinski_harabasz_matches_sklearn_formula(spark):
    from zoom_spark.queries.round9_ops import (
        CH_QSCALE,
        calinski_harabasz_labels,
    )

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.floor(
        np.stack(emb["embedding"].to_numpy()).astype(np.float64) * CH_QSCALE
        + 0.5
    )
    labels = emb["label"].to_numpy()
    n, k = len(X), len(set(labels))
    gmean = X.mean(axis=0)
    ssw = ssb = 0.0
    for lab in set(labels):
        sub = X[labels == lab]
        mu = sub.mean(axis=0)
        ssw += ((sub - mu) ** 2).sum()
        ssb += len(sub) * ((mu - gmean) ** 2).sum()
    want = (ssb / (k - 1)) / (ssw / (n - k))
    row = calinski_harabasz_labels(spark, SF_DIR).collect()[0]
    assert row["n_vectors"] == n and row["n_labels"] == k
    assert abs(row["ch_index"] - want) / want < 1e-6


def test_cox_one_step_matches_bruteforce(spark):
    from zoom_spark.queries.round9_ops import cox_one_step_cohort

    ev = _events().copy()
    ev["us"] = pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype(
        "int64"
    ) // 1000
    rows = []
    for uid, grp in ev.groupby("user_id"):
        first = grp["us"].min()
        p = grp.loc[grp["event_type"] == "purchase", "us"]
        if len(p):
            rows.append((p.min() - first, 1, uid % 2))
        else:
            rows.append((grp["us"].max() - first, 0, uid % 2))
    df = pd.DataFrame(rows, columns=["t", "d", "x"])
    u_score = info = 0.0
    for t in sorted(df.loc[df["d"] == 1, "t"].unique()):
        at_risk = df[df["t"] >= t]
        s0, s1 = len(at_risk), int(at_risk["x"].sum())
        ev_t = df[(df["t"] == t) & (df["d"] == 1)]
        dcnt, dcnt1 = len(ev_t), int(ev_t["x"].sum())
        frac = s1 / s0
        u_score += dcnt1 - dcnt * frac
        info += dcnt * frac * (1 - frac)
    row = cox_one_step_cohort(spark, SF_DIR).collect()[0]
    assert row["n_users"] == len(df)
    assert row["n_cohort1"] == int(df["x"].sum())
    assert abs(row["beta_one_step"] - u_score / info) < 1e-5
    assert abs(row["se_beta"] - 1 / math.sqrt(info)) < 1e-6


def test_hamming_knn_matches_numpy(spark):
    from zoom_spark.queries.round9_ops import (
        HAM_QUERIES,
        hamming_knn_signbits,
    )

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy())
    ids = emb["vec_id"].to_numpy()
    bits = (X > 0).astype(np.uint8)  # full 64-bit sign mask
    got = hamming_knn_signbits(spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append(r)
    for q in np.where(ids < HAM_QUERIES)[0]:
        d = (bits ^ bits[q]).sum(axis=1)
        order = sorted(
            (int(d[i]), int(ids[i])) for i in range(len(ids)) if i != q
        )
        want = order[:5]
        rows = sorted(by_q[int(ids[q])], key=lambda r: r["rnk"])
        assert [(r["hamming"], r["neighbor_id"]) for r in rows] == want


def test_linkage_prefix_features_matches_python(spark):
    from zoom_spark.queries.round9_ops import linkage_prefix_features

    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    srt = part.sort_values(["p_name", "p_partkey"]).reset_index(drop=True)
    rows = linkage_prefix_features(spark, SF_DIR).collect()
    assert len(rows) == len(srt) - 1
    by_pair = {(r["key_a"], r["key_b"]): r for r in rows}
    for i in range(len(srt) - 1):
        a, b = srt.iloc[i], srt.iloc[i + 1]
        r = by_pair[(a["p_partkey"], b["p_partkey"])]
        na, nb = a["p_name"], b["p_name"]
        lcp = 0
        while lcp < min(len(na), len(nb)) and na[lcp] == nb[lcp]:
            lcp += 1
        lcs = 0
        while lcs < min(len(na), len(nb)) and na[-1 - lcs] == nb[-1 - lcs]:
            lcs += 1
        assert r["lcp_len"] == lcp
        assert r["lcs_len"] == lcs
        assert r["same_block"] == int(
            na.split(" ")[-1] == nb.split(" ")[-1]
        )


def test_poisson_glm_matches_closed_form(spark):
    from zoom_spark.queries.round9_ops import poisson_glm_daily

    ev = _events()
    day = pd.to_datetime(ev["ts"]).dt.date
    cnt = ev.assign(day=day).groupby("day").size()
    wd = (pd.to_datetime(cnt.index) - pd.Timestamp("2024-01-01")).days % 7
    is_we = np.isin(wd, [5, 6])
    y = cnt.to_numpy(float)
    mu0, mu1 = y[~is_we].mean(), y[is_we].mean()
    row = poisson_glm_daily(spark, SF_DIR).collect()[0]
    # one-covariate Poisson MLE closed form: fitted group means
    assert row["n_days"] == len(y)
    assert abs(row["mu_weekday"] - mu0) < 1e-3
    assert abs(row["mu_weekend"] - mu1) < 1e-3
    assert abs(row["beta_weekend"] - math.log(mu1 / mu0)) < 1e-4


def test_louvain_moves_matches_python(spark):
    from collections import defaultdict

    from zoom_spark.queries.round9_ops import (
        LOUVAIN_ROUNDS,
        louvain_moves_copurchase,
    )

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(set(grp["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    deg = {n: len(ns) for n, ns in adj.items()}
    m = len(edges)
    lab = {n: n for n in adj}
    for _ in range(LOUVAIN_ROUNDS):
        tot = defaultdict(int)
        for n, c in lab.items():
            tot[c] += deg[n]
        new = {}
        for u in adj:
            kuc = defaultdict(int)
            for v in adj[u]:
                kuc[lab[v]] += 1
            kuc.setdefault(lab[u], 0)
            best = None
            for c, k in kuc.items():
                t = tot[c] - (deg[u] if c == lab[u] else 0)
                s = 2 * m * k - deg[u] * t
                key = (-s, c)
                if best is None or key < best[0]:
                    best = (key, c)
            new[u] = best[1]
        lab = new
    sizes = defaultdict(int)
    for n, c in lab.items():
        sizes[c] += 1
    got = {r["community"]: r for r in louvain_moves_copurchase(spark, SF_DIR).collect()}
    assert {c: r["n_nodes"] for c, r in got.items()} == dict(sizes)
    # modularity sanity: in [-0.5, 1], identical across rows
    qs = {r["modularity"] for r in got.values()}
    assert len(qs) == 1 and -0.5 <= qs.pop() <= 1.0


def test_average_precision_matches_sklearn_formula(spark):
    from zoom_spark.queries.round9_ops import average_precision_purchase

    ev = _events()
    g = ev.groupby("user_id")
    score = g.size()
    rel = g["event_type"].apply(lambda s: int((s == "purchase").any()))
    df = pd.DataFrame({"score": score, "rel": rel}).reset_index()
    df = df.sort_values(
        ["score", "user_id"], ascending=[False, True]
    ).reset_index(drop=True)
    cum = df["rel"].cumsum()
    k = np.arange(1, len(df) + 1)
    p = int(df["rel"].sum())
    want = float((cum[df["rel"] == 1] / k[df["rel"] == 1]).sum() / p)
    row = average_precision_purchase(spark, SF_DIR).collect()[0]
    assert row["n_users"] == len(df) and row["n_positive"] == p
    assert abs(row["average_precision"] - want) < 1e-6
    assert row["average_precision"] >= row["prevalence_baseline"]


def test_herfindahl_matches_pandas(spark):
    from zoom_spark.queries.round9_ops import herfindahl_supplier_nation

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    sup = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    j = li.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    j["cents"] = (j["l_extendedprice"] * 100).astype("int64")
    rev = j.groupby(["s_nationkey", "l_suppkey"])["cents"].sum()
    got = {
        r["nation"]: r
        for r in herfindahl_supplier_nation(spark, SF_DIR).collect()
    }
    for nation, grp in rev.groupby(level=0):
        shares = grp / grp.sum()
        want = float((shares**2).sum())
        assert abs(got[nation]["hhi"] - want) < 1e-6
        assert got[nation]["n_suppliers"] == len(grp)
        assert got[nation]["hhi"] >= got[nation]["hhi_uniform_floor"] - 1e-9


def test_lepage_composes_component_tests(spark):
    from zoom_spark.queries import QUERIES
    from zoom_spark.queries.round9_ops import lepage_test_weekend

    zw = QUERIES["mann_whitney_u_weekend"](spark, SF_DIR).collect()[0]["z"]
    zab = QUERIES["ansari_bradley_weekend"](spark, SF_DIR).collect()[0]["z"]
    row = lepage_test_weekend(spark, SF_DIR).collect()[0]
    assert abs(row["lepage_stat"] - (zw * zw + zab * zab)) < 1e-6
    assert row["lepage_stat"] >= 0


def test_personalized_pagerank_matches_python(spark):
    import hashlib
    from collections import defaultdict

    from zoom_spark.queries.round9_ops import (
        PPR_DAMPING,
        PPR_ITERS,
        PPR_SEEDS,
        personalized_pagerank_parts,
    )

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(set(grp["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    nodes = sorted(adj)
    seeds = sorted(
        nodes, key=lambda n: (hashlib.md5(str(n).encode()).hexdigest(), n)
    )[:PPR_SEEDS]
    s = {n: (1.0 / PPR_SEEDS if n in seeds else 0.0) for n in nodes}
    import math

    snap9 = lambda v: math.floor(v * 1e9 + 0.5) / 1e9  # noqa: E731
    rank = dict(s)
    for _ in range(PPR_ITERS):
        mass = defaultdict(float)
        for n in nodes:
            c = rank[n] / len(adj[n])
            for v in adj[n]:
                mass[v] += c
        rank = {
            n: snap9((1 - PPR_DAMPING) * s[n] + PPR_DAMPING * mass[n])
            for n in nodes
        }
    q6 = {n: math.floor(r * 1e6 + 0.5) / 1e6 for n, r in rank.items()}
    want = sorted(
        ((r, n) for n, r in q6.items() if r > 0),
        key=lambda t: (-t[0], t[1]),
    )[:50]
    got = personalized_pagerank_parts(spark, SF_DIR).collect()
    assert [(r["ppr_q6"], r["part_id"]) for r in got] == [
        (r, n) for r, n in want
    ]


def test_icc_matches_formula(spark):
    from zoom_spark.queries.round9_ops import icc_acctbal_nation

    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    x = (c["c_acctbal"] * 100).round().astype("int64")
    g = c["c_nationkey"]
    N, J = len(x), g.nunique()
    grand = x.sum() ** 2 / N
    sgs = sum(grp.sum() ** 2 / len(grp) for _, grp in x.groupby(g))
    ssb, ssw = sgs - grand, (x**2).sum() - sgs
    msb, msw = ssb / (J - 1), ssw / (N - J)
    k0 = (N - sum(len(grp) ** 2 for _, grp in x.groupby(g)) / N) / (J - 1)
    want = (msb - msw) / (msb + (k0 - 1) * msw)
    row = icc_acctbal_nation(spark, SF_DIR).collect()[0]
    assert row["n_customers"] == N and row["n_nations"] == J
    assert abs(row["k0"] - k0) < 1e-5
    assert abs(row["icc1"] - want) < 1e-5


def test_bland_altman_matches_pandas(spark):
    from zoom_spark.queries.round9_ops import bland_altman_order_totals

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    m2 = (
        np.floor(li["l_extendedprice"] * 100 + 0.5).astype("int64")
        * (100 - np.floor(li["l_discount"] * 100 + 0.5).astype("int64"))
        * (100 + np.floor(li["l_tax"] * 100 + 0.5).astype("int64"))
    ).groupby(li["l_orderkey"]).sum()
    j = o.set_index("o_orderkey").join(m2.rename("m2"), how="inner")
    diff = (
        np.floor(j["o_totalprice"] * 100 + 0.5).astype("int64") * 10000
        - j["m2"]
    ) / 1e8
    md, sd = diff.mean(), diff.std(ddof=0)
    row = bland_altman_order_totals(spark, SF_DIR).collect()[0]
    assert row["n_orders"] == len(j)
    assert abs(row["mean_diff"] - md) < 1e-3
    assert abs(row["sd_diff"] - sd) < 1e-3
    lo, hi = row["loa_low"], row["loa_high"]
    assert row["n_outside"] == int(((diff < lo) | (diff > hi)).sum())


def test_mantel_haenszel_matches_pandas(spark):
    from zoom_spark.queries.round9_ops import mantel_haenszel_weekend_value

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    wd = (
        pd.to_datetime(o["o_orderdate"]) - pd.Timestamp("1990-01-01")
    ).dt.days % 7
    e = wd.isin([5, 6]).astype(int)
    y = (o["o_totalprice"] > 150000).astype(int)
    num = den = 0.0
    for _, idx in o.groupby("o_orderpriority").groups.items():
        ee, yy = e.loc[idx], y.loc[idx]
        a = int(((ee == 1) & (yy == 1)).sum())
        b = int(((ee == 1) & (yy == 0)).sum())
        cc = int(((ee == 0) & (yy == 1)).sum())
        d = int(((ee == 0) & (yy == 0)).sum())
        n = len(idx)
        num += a * d / n
        den += b * cc / n
    row = mantel_haenszel_weekend_value(spark, SF_DIR).collect()[0]
    assert row["n_strata"] == o["o_orderpriority"].nunique()
    assert abs(row["or_mh"] - num / den) < 1e-5


def test_cramers_v_matches_formula(spark):
    from zoom_spark.queries import QUERIES
    from zoom_spark.queries.round9_ops import cramers_v_event_dow

    cs = QUERIES["chi_square_independence"](spark, SF_DIR).collect()[0]
    ev = _events()
    k = ev["event_type"].nunique()
    want_v = math.sqrt(cs["chi2"] / (cs["n"] * min(k - 1, 6)))
    want_c = math.sqrt(cs["chi2"] / (cs["chi2"] + cs["n"]))
    row = cramers_v_event_dow(spark, SF_DIR).collect()[0]
    assert abs(row["cramers_v"] - want_v) < 1e-6
    assert abs(row["contingency_coef"] - want_c) < 1e-6
    assert 0 <= row["cramers_v"] <= 1

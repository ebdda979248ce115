"""Referee / planted-input tests for the round-5 training-prep
operators (zoom_spark/queries/training_prep.py). The oracle gate pins
cross-engine parity; these pin the ALGORITHMIC claims against
independent numpy / pure-python referees."""

from __future__ import annotations

import importlib
from unittest.mock import patch

import numpy as np

SF_DIR = "/root/testdata/sf0.001"


def _with_docs(spark, rows, fn):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    mod = importlib.import_module(fn.__module__)
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        return fn(spark, SF_DIR).collect()


# ---------- R80 decontamination ----------


def test_decontamination_planted_overlap(spark):
    from zoom_spark.queries.training_prep import decontaminate_ngram_overlap

    span = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly one 8-gram
    rows = [
        (0, f"pre {span} post"),          # test doc (0 % 17 == 0)
        (1, f"other stuff {span} tail"),  # train: contains the test 8-gram
        (2, "a b c d e f g h i j"),       # train: disjoint
        (3, "too short"),                 # train: < 8 words, 0 shingles
    ]
    out = {r["doc_id"]: r for r in _with_docs(spark, rows, decontaminate_ngram_overlap)}
    assert set(out) == {1, 2, 3}  # test doc excluded from verdicts
    assert out[1]["contaminated"] == 1 and out[1]["n_overlap"] >= 1
    assert out[2]["contaminated"] == 0 and out[2]["n_overlap"] == 0
    assert out[3] == out[3].__class__(
        doc_id=3, n_shingles=0, n_overlap=0, contaminated=0
    ) or (out[3]["n_shingles"] == 0 and out[3]["contaminated"] == 0)


def test_decontamination_misaligned_copy_is_still_caught(spark):
    from zoom_spark.queries.training_prep import decontaminate_ngram_overlap

    span = " ".join(f"t{i}" for i in range(8))
    rows = [
        (0, f"x1 x2 x3 {span}"),  # test doc, span at offset 3
        (1, f"{span} y1 y2"),     # train doc, span at offset 0
    ]
    out = {r["doc_id"]: r for r in _with_docs(spark, rows, decontaminate_ngram_overlap)}
    assert out[1]["contaminated"] == 1  # shingle identity is position-free


# ---------- R81 regression aggregates ----------


def test_regr_aggregates_match_numpy(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import regr_aggregates_lineitem

    rows = regr_aggregates_lineitem(spark, SF_DIR).collect()
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).toPandas()
    for r in rows:
        g = li[li["l_returnflag"] == r["l_returnflag"]]
        x, y = g["l_quantity"].to_numpy(), g["l_extendedprice"].to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        pred = slope * x + intercept
        r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
        assert r["n"] == len(g)
        assert abs(r["slope"] - slope) < 1e-3
        assert abs(r["intercept"] - intercept) < 1e-3
        assert abs(r["r2"] - r2) < 1e-5
        assert abs(r["avg_x"] - x.mean()) < 1e-3
        assert abs(r["avg_y"] - y.mean()) < 1e-3


# ---------- R82 gopher flags ----------


def test_gopher_flags_planted_failures(spark):
    from zoom_spark.queries.training_prep import gopher_quality_flags

    good = "the quick brown foxes jumped over a lazy sleeping hound " * 4
    rows = [
        (0, good.strip()),                      # passes every gate (40 words)
        (1, "tiny doc"),                        # too few words
        (2, " ".join(["zz"] * 50)),             # top-word dominance + short words
        (3, " ".join(f"w{i}" for i in range(50))),  # no stopwords
    ]
    out = {r["doc_id"]: r for r in _with_docs(spark, rows, gopher_quality_flags)}
    assert out[0]["keep"] == 1
    assert out[1]["keep"] == 0 and out[1]["n_words"] == 2
    assert out[2]["keep"] == 0 and out[2]["top_word_frac"] == 1.0
    assert out[3]["keep"] == 0 and out[3]["stop_frac"] == 0.0


# ---------- R83 winsorized stats ----------


def test_winsorized_stats_match_numpy(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import winsorized_price_stats

    rows = winsorized_price_stats(spark, SF_DIR).collect()
    od = load_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    for r in rows:
        v = od[od["o_orderpriority"] == r["o_orderpriority"]][
            "o_totalprice"
        ].to_numpy()
        p05, p95 = np.percentile(v, [5, 95])  # linear interp == percentile_cont
        w = np.clip(v, p05, p95)
        assert r["n"] == len(v)
        assert abs(r["p05"] - p05) < 1e-3
        assert abs(r["p95"] - p95) < 1e-3
        assert abs(r["winsor_mean"] - w.mean()) < 1e-3
        assert abs(r["winsor_std"] - w.std(ddof=1)) < 1e-3


# ---------- R84 Cohen's kappa ----------


def test_cohens_kappa_matches_closed_form(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import cohens_kappa_raters

    [r] = cohens_kappa_raters(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select(
        "n_chars", "text"
    ).toPandas()
    nw = docs["text"].str.split().str.len().to_numpy()
    ra = (docs["n_chars"].to_numpy() > np.percentile(docs["n_chars"], 50)).astype(int)
    rb = (nw > np.percentile(nw, 50)).astype(int)
    n = len(ra)
    po = (ra == rb).mean()
    pa1, pb1 = ra.mean(), rb.mean()
    pe = pa1 * pb1 + (1 - pa1) * (1 - pb1)
    kappa = (po - pe) / (1 - pe)
    assert r["n"] == n
    assert abs(r["po"] - po) < 1e-6
    assert abs(r["pe"] - pe) < 1e-6
    assert abs(r["kappa"] - kappa) < 1e-5


def test_kappa_is_one_for_perfect_agreement(spark):
    # planted: rater_a == rater_b on every doc (n_chars tracks words 1:1)
    from zoom_spark.queries.training_prep import cohens_kappa_raters

    rows = [(i, " ".join(["w"] * (5 + i))) for i in range(10)]
    out = _with_docs(spark, rows, cohens_kappa_raters)
    assert out[0]["kappa"] == 1.0


# ---------- R85 ROC AUC ----------


def _auc_referee(scores, labels):
    """Tie-corrected Mann-Whitney AUC via average ranks (numpy only)."""
    order = np.argsort(scores, kind="mergesort")
    s, y = np.asarray(scores)[order], np.asarray(labels)[order]
    ranks = np.empty(len(s), dtype=float)
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and s[j + 1] == s[i]:
            j += 1
        ranks[i : j + 1] = (i + j) / 2.0 + 1.0
        i = j + 1
    n_pos, n_neg = int(y.sum()), int((1 - y).sum())
    u = ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2.0
    return u / (n_pos * n_neg)


def test_roc_auc_matches_rank_referee(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import roc_auc_purchase_value

    [r] = roc_auc_purchase_value(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").select("event_type", "value").toPandas()
    y = (ev["event_type"] == "purchase").astype(int).to_numpy()
    auc = _auc_referee(ev["value"].to_numpy(), y)
    assert r["n_pos"] == int(y.sum())
    assert r["n_neg"] == int((1 - y).sum())
    assert abs(r["auc"] - auc) < 1e-6


def test_roc_auc_perfect_and_random_separation(spark):
    from pyspark.sql import functions as F  # noqa: F401
    from zoom_spark.queries.training_prep import roc_auc_purchase_value

    mod = importlib.import_module(roc_auc_purchase_value.__module__)
    # perfect: every purchase outranks every non-purchase
    rows = [(i, "purchase" if i >= 50 else "view", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        [r] = roc_auc_purchase_value(spark, SF_DIR).collect()
    assert r["auc"] == 1.0
    # all-ties: AUC is exactly 0.5 by the tie-correction
    rows = [(i, "purchase" if i % 2 else "view", 7.0) for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        [r] = roc_auc_purchase_value(spark, SF_DIR).collect()
    assert r["auc"] == 0.5


# ---------- R86 OLS normal equations ----------


def test_ols_matches_numpy_lstsq(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import ols_normal_equations

    [r] = ols_normal_equations(spark, SF_DIR).collect()
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).toPandas()
    X = np.column_stack(
        [
            np.ones(len(li)),
            li["l_quantity"].to_numpy(),
            li["l_discount"].to_numpy(),
        ]
    )
    yv = li["l_extendedprice"].to_numpy() / 1000.0
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    assert r["n"] == len(li)
    # moment rounding perturbs coefficients by far less than 1e-4
    assert abs(r["b0"] - beta[0]) < 1e-3
    assert abs(r["b1"] - beta[1]) < 1e-3
    assert abs(r["b2"] - beta[2]) < 1e-3


# ---------- R87 Poisson bootstrap CI ----------


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import bootstrap_ci_order_value

    [r1] = bootstrap_ci_order_value(spark, SF_DIR).collect()
    [r2] = bootstrap_ci_order_value(spark, SF_DIR).collect()
    assert r1 == r2  # md5-derived resamples are deterministic
    od = load_table(spark, SF_DIR, "orders").select("o_totalprice").toPandas()
    true_mean = od["o_totalprice"].mean()
    assert abs(r1["mean_est"] - true_mean) < 1e-2
    assert r1["ci_lo"] < true_mean < r1["ci_hi"]
    # CI width should be in the right ballpark of +/- ~3 SEM
    sem = od["o_totalprice"].std() / np.sqrt(len(od))
    assert (r1["ci_hi"] - r1["ci_lo"]) < 8 * sem
    assert (r1["ci_hi"] - r1["ci_lo"]) > 0.5 * sem


def test_bootstrap_ci_degenerate_constant_column(spark):
    from zoom_spark.queries.training_prep import bootstrap_ci_order_value

    mod = importlib.import_module(bootstrap_ci_order_value.__module__)
    rows = [(i, 42.0) for i in range(500)]
    df = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        [r] = bootstrap_ci_order_value(spark, SF_DIR).collect()
    assert r["mean_est"] == r["ci_lo"] == r["ci_hi"] == 42.0


# ---------- R88 PMI co-occurrence ----------


def test_pmi_matches_hand_computation(spark):
    from zoom_spark.queries.training_prep import pmi_cooccurrence

    mod = importlib.import_module(pmi_cooccurrence.__module__)
    # 80 docs: "alpha beta" in all 80; "gamma" in the first 40 only.
    rows = [
        (i, "alpha beta gamma" if i < 40 else "alpha beta")
        for i in range(80)
    ]
    out = _with_docs(spark, rows, pmi_cooccurrence)
    by_pair = {(r["w1"], r["w2"]): r for r in out}
    ab = by_pair[("alpha", "beta")]
    assert ab["n_pair"] == 80 and ab["df1"] == 80 and ab["df2"] == 80
    assert ab["pmi"] == 0.0  # independent under saturation: ln(80*80/6400)
    ag = by_pair[("alpha", "gamma")]
    assert ag["n_pair"] == 40
    # gamma co-occurs with alpha in every gamma-doc: ln(40*80/(80*40)) = 0
    assert ag["pmi"] == 0.0
    bg = by_pair[("beta", "gamma")]
    assert bg["pmi"] == 0.0


def test_pmi_positive_for_correlated_rare_pair(spark):
    from zoom_spark.queries.training_prep import pmi_cooccurrence

    # "x y" always together in 40 of 100 docs -> PMI = ln(100/40) > 0
    rows = [(i, "x y filler" if i < 40 else "filler only") for i in range(100)]
    out = _with_docs(spark, rows, pmi_cooccurrence)
    by_pair = {(r["w1"], r["w2"]): r for r in out}
    import math

    xy = by_pair[("x", "y")]
    assert abs(xy["pmi"] - round(math.log(100 * 40 / (40 * 40)), 6)) < 1e-9


# ---------- R89 CCNet perplexity buckets ----------


def test_ccnet_buckets_respect_per_source_cuts(spark):
    from zoom_spark.queries.training_prep import ccnet_perplexity_buckets

    rows = ccnet_perplexity_buckets(spark, SF_DIR).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert len(by_source) > 1
    for src, docs in by_source.items():
        head = [r["lp"] for r in docs if r["bucket"] == "head"]
        mid = [r["lp"] for r in docs if r["bucket"] == "middle"]
        tail = [r["lp"] for r in docs if r["bucket"] == "tail"]
        assert head and tail, f"{src} missing extreme buckets"
        # bucket boundaries are per-source order-respecting
        if mid:
            assert min(head) >= max(mid) >= min(mid) >= max(tail)
        else:
            assert min(head) >= max(tail)
        # tertile split: no bucket takes more than ~55% of a source
        n = len(docs)
        for b in (head, mid, tail):
            assert len(b) <= 0.56 * n + 1


# ---------- R90 logistic regression ----------


def test_logreg_matches_numpy_gd_referee(spark):
    import pandas as pd
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import (
        LOGREG_ITERS,
        LOGREG_LR,
        logreg_purchase_model,
    )

    [r] = logreg_purchase_model(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "value"
    ).toPandas()
    g = ev.groupby("user_id")
    f1 = np.log(g.size().to_numpy().astype(float))
    f2 = g["value"].mean().to_numpy()
    y = g["event_type"].apply(lambda s: int((s == "purchase").any())).to_numpy()
    x1 = (f1 - f1.mean()) / f1.std()  # ddof=0 == stddev_pop
    x2 = (f2 - f2.mean()) / f2.std()
    w = np.zeros(3)
    X = np.column_stack([np.ones(len(y)), x1, x2])
    for _ in range(LOGREG_ITERS):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w -= LOGREG_LR * (X.T @ (p - y)) / len(y)
    assert r["n"] == len(y)
    assert abs(r["w0"] - w[0]) < 1e-5
    assert abs(r["w1"] - w[1]) < 1e-5
    assert abs(r["w2"] - w[2]) < 1e-5
    acc = (((X @ w) > 0).astype(int) == y).mean()
    assert abs(r["train_acc"] - acc) < 1e-6
    assert 0.0 <= r["train_acc"] <= 1.0


# ---------- R91 quantile normalization ----------


def test_quantile_normalize_matches_pandas_rank(spark):
    from zoom_spark.queries.training_prep import quantile_normalize_spend

    rows = quantile_normalize_spend(spark, SF_DIR).collect()
    import pandas as pd

    df = pd.DataFrame([r.asDict() for r in rows])
    for seg, g in df.groupby("c_mktsegment"):
        n = len(g)
        # percent_rank = (rank_min - 1) / (n - 1)
        expected = (g["spend"].rank(method="min") - 1) / (n - 1)
        assert np.allclose(g["q"], expected.round(6), atol=1e-6)
        assert g["q"].min() == 0.0 and g["q"].max() == 1.0


# ---------- R92 DoReMi weights ----------


def test_doremi_weights_sum_to_one_and_are_monotone(spark):
    from zoom_spark.queries.training_prep import doremi_source_weights

    rows = doremi_source_weights(spark, SF_DIR).collect()
    total = sum(r["weight"] for r in rows)
    assert abs(total - 1.0) < 1e-4  # rounding each weight to 6dp
    ordered = sorted(rows, key=lambda r: r["score"])
    ws = [r["weight"] for r in ordered]
    assert ws == sorted(ws)  # higher score -> higher weight


# ---------- R93 rolling 7-day actives ----------


def test_rolling_7day_matches_pandas_referee(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import rolling_7day_active_users

    rows = {r["day"]: r["active_7d"] for r in
            rolling_7day_active_users(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events").select("ts", "user_id").toPandas()
    ev["day"] = ev["ts"].dt.date
    days = sorted(ev["day"].unique())
    import datetime

    for d in days:
        lo = d - datetime.timedelta(days=6)
        expected = ev[(ev["day"] >= lo) & (ev["day"] <= d)]["user_id"].nunique()
        assert rows[d] == expected, d
    assert set(rows) == set(days)


# ---------- R94 reciprocal rank fusion ----------


def test_rrf_matches_pandas_referee(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import RRF_K, rrf_customer_rankings

    rows = rrf_customer_rankings(spark, SF_DIR).collect()
    od = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    ).toPandas()
    g = od.groupby("o_custkey").agg(
        spend=("o_totalprice", "sum"), last=("o_orderdate", "max")
    ).reset_index()
    g["spend"] = g["spend"].round(2)
    # the query ranks over the TOTAL order (metric desc, custkey asc),
    # so ranks are 1..n with deterministic tie-breaks — reproduce that
    g = g.sort_values(["spend", "o_custkey"], ascending=[False, True])
    g["r_spend"] = range(1, len(g) + 1)
    g = g.sort_values(["last", "o_custkey"], ascending=[False, True])
    g["r_recent"] = range(1, len(g) + 1)
    g["rrf"] = (1.0 / (RRF_K + g["r_spend"]) + 1.0 / (RRF_K + g["r_recent"])).round(6)
    top = g.sort_values(["rrf", "o_custkey"], ascending=[False, True]).head(100)
    expect = list(zip(top["o_custkey"], top["rrf"]))
    got = [(r["c_custkey"], r["rrf"]) for r in rows]
    assert got == expect


# ---------- R95 eventually-follows ----------


def test_eventually_follows_planted_sequences(spark):
    from zoom_spark.queries.training_prep import eventually_follows_pairs

    mod = importlib.import_module(eventually_follows_pairs.__module__)
    import datetime

    t0 = datetime.datetime(2024, 1, 1)

    def ev(eid, uid, sec, typ):
        return (eid, t0 + datetime.timedelta(seconds=sec), uid, typ, 1.0, "{}")

    rows = [
        ev(1, 1, 0, "view"), ev(2, 1, 10, "click"), ev(3, 1, 20, "purchase"),
        ev(4, 2, 0, "click"), ev(5, 2, 5, "view"),
        # user 3: tie timestamps -> event_id order decides
        ev(6, 3, 0, "signup"), ev(7, 3, 0, "error"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string"
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df), \
         patch.object(mod, "EF_MIN_USERS", 1):
        out = eventually_follows_pairs(spark, SF_DIR).collect()
    pairs = {(r["t1"], r["t2"]): r for r in out}
    assert pairs[("view", "click")]["n_users_pair"] == 1   # user 1
    assert pairs[("click", "view")]["n_users_pair"] == 1   # user 2
    assert pairs[("view", "purchase")]["n_users_pair"] == 1
    assert pairs[("click", "purchase")]["n_users_pair"] == 1
    assert pairs[("signup", "error")]["n_users_pair"] == 1  # tie by event_id
    assert ("error", "signup") not in pairs
    assert ("purchase", "view") not in pairs
    # support normalizes by ALL users
    assert abs(pairs[("view", "click")]["support"] - round(1 / 3, 6)) < 1e-9


# ---------- R96 KS test ----------


def test_ks_statistic_matches_numpy_ecdf(spark):
    import pandas as pd
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import ks_test_weekend_value

    [r] = ks_test_weekend_value(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").select("ts", "value").toPandas()
    wd = (ev["ts"].dt.normalize() - pd.Timestamp("2024-01-01")).dt.days % 7
    a = np.sort(ev.loc[wd.isin([5, 6]), "value"].to_numpy())
    b = np.sort(ev.loc[~wd.isin([5, 6]), "value"].to_numpy())
    grid = np.unique(np.concatenate([a, b]))
    d = np.abs(
        np.searchsorted(a, grid, side="right") / len(a)
        - np.searchsorted(b, grid, side="right") / len(b)
    ).max()
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    assert abs(r["ks_d"] - d) < 1e-6
    n_eff = len(a) * len(b) / (len(a) + len(b))
    assert abs(r["p_value"] - 2 * np.exp(-2 * r["ks_d"] ** 2 * n_eff)) < 1e-5


def test_ks_disjoint_supports_give_d_one(spark):
    import datetime
    from zoom_spark.queries.training_prep import ks_test_weekend_value

    mod = importlib.import_module(ks_test_weekend_value.__module__)
    rows = []
    # weekend days (wd 5,6 from 2024-01-01 anchor): Jan 6 (sat), Jan 7
    for i in range(50):
        rows.append((i, datetime.datetime(2024, 1, 6, 1, 0, i), i, "view",
                     100.0 + i, "{}"))       # weekend: values >= 100
        rows.append((1000 + i, datetime.datetime(2024, 1, 2, 1, 0, i), i,
                     "view", float(i), "{}"))  # weekday: values < 100
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string"
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        [r] = ks_test_weekend_value(spark, SF_DIR).collect()
    assert r["ks_d"] == 1.0


# ---------- R97 Neyman allocation ----------


def test_neyman_allocation_proportional_and_budgeted(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import (
        NEYMAN_BUDGET,
        neyman_allocation,
    )

    rows = neyman_allocation(spark, SF_DIR).collect()
    od = load_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    g = od.groupby("o_orderpriority")["o_totalprice"]
    nh = g.size()
    sh = g.std(ddof=1).round(6)
    z = (nh * sh).sum()
    for r in rows:
        k = r["o_orderpriority"]
        assert r["n_h"] == nh[k]
        assert abs(r["s_h"] - sh[k]) < 1e-6
        assert r["alloc"] == round(NEYMAN_BUDGET * nh[k] * sh[k] / z)
    total = sum(r["alloc"] for r in rows)
    assert abs(total - NEYMAN_BUDGET) <= len(rows)  # rounding slack


# ---------- R98 Benford ----------


def test_benford_mechanics_on_planted_digits(spark):
    from zoom_spark.queries.training_prep import benford_first_digit

    mod = importlib.import_module(benford_first_digit.__module__)
    # 30 values starting with 1, 10 with 2, 10 with 9
    vals = [1000.0 + i for i in range(30)] + [250.0 + i for i in range(10)] \
        + [9000.0 + i for i in range(10)]
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)],
        "o_orderkey long, o_totalprice double",
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        out = {r["digit"]: r for r in benford_first_digit(spark, SF_DIR).collect()}
    assert out[1]["n"] == 30 and out[2]["n"] == 10 and out[9]["n"] == 10
    assert abs(out[1]["obs_frac"] - 0.6) < 1e-9
    import math

    for d, r in out.items():
        bf = math.log10(1 + 1 / d)
        assert abs(r["benford_frac"] - round(bf, 6)) < 1e-9
        chi = (r["n"] / 50 - bf) ** 2 / bf * 50
        assert abs(r["chi2_part"] - chi) < 1e-4


def test_benford_real_orders_fracs_sum_to_one(spark):
    from zoom_spark.queries.training_prep import benford_first_digit

    rows = benford_first_digit(spark, SF_DIR).collect()
    assert abs(sum(r["obs_frac"] for r in rows) - 1.0) < 1e-4
    assert {r["digit"] for r in rows} <= set(range(1, 10))


# ---------- R99 composed flagship ----------


def test_pretrain_pipeline_consistent_with_stages(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import (
        ccnet_perplexity_buckets,
        decontaminate_ngram_overlap,
        gopher_quality_flags,
        pretrain_corpus_pipeline,
    )

    out = pretrain_corpus_pipeline(spark, SF_DIR).collect()
    assert out, "pipeline should keep some documents"
    # stage-consistency referee: recompute the survivor set from the
    # three standalone gated queries in driver python
    decon_ok = {
        r["doc_id"]
        for r in decontaminate_ngram_overlap(spark, SF_DIR).collect()
        if r["contaminated"] == 0
    }
    gq = {
        r["doc_id"]: r["n_words"]
        for r in gopher_quality_flags(spark, SF_DIR).collect()
        if r["keep"] == 1
    }
    tiers = {
        r["doc_id"]: r["source"]
        for r in ccnet_perplexity_buckets(spark, SF_DIR).collect()
        if r["bucket"] in ("head", "middle")
    }
    survivors = decon_ok & set(gq) & set(tiers)
    by_source = {}
    for d in survivors:
        s = tiers[d]
        by_source.setdefault(s, [0, 0])
        by_source[s][0] += 1
        by_source[s][1] += gq[d]
    assert {r["source"]: (r["n_docs"], r["n_tokens"]) for r in out} == {
        s: tuple(v) for s, v in by_source.items()
    }
    n_total = load_table(spark, SF_DIR, "documents").count()
    n_kept = sum(r["n_docs"] for r in out)
    assert 0 < n_kept < n_total  # the gates actually filter
    assert abs(sum(r["doc_share"] for r in out) - 1.0) < 1e-3


# ---------- R100 EWMA ----------


def test_ewma_matches_pandas_ewm(spark):
    import pandas as pd
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import EWMA_ALPHA, ewma_user_value

    rows = {r["user_id"]: r for r in ewma_user_value(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value"
    ).toPandas().sort_values(["user_id", "ts", "event_id"])
    for uid, g in ev.groupby("user_id"):
        ref = g["value"].ewm(alpha=EWMA_ALPHA, adjust=True).mean().iloc[-1]
        assert rows[uid]["n_events"] == len(g)
        assert abs(rows[uid]["ewma"] - ref) < 1e-5, uid


def test_ewma_constant_series_is_identity(spark):
    import datetime
    from zoom_spark.queries.training_prep import ewma_user_value

    mod = importlib.import_module(ewma_user_value.__module__)
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, t0 + datetime.timedelta(minutes=i), 1, "view", 7.5, "{}")
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string"
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        [r] = ewma_user_value(spark, SF_DIR).collect()
    assert r["ewma"] == 7.5


# ---------- R101 CUSUM ----------


def test_cusum_finds_planted_mean_shift(spark):
    import datetime
    from zoom_spark.queries.training_prep import cusum_changepoint_revenue

    mod = importlib.import_module(cusum_changepoint_revenue.__module__)
    d0 = datetime.date(2024, 1, 1)
    # 40 days at level 100, then 40 days at level 200 -> the CUSUM
    # trough is at the last low day (day index 39)
    rows = []
    k = 0
    for i in range(80):
        level = 100.0 if i < 40 else 200.0
        rows.append((k, d0 + datetime.timedelta(days=i), level))
        k += 1
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        [r] = cusum_changepoint_revenue(spark, SF_DIR).collect()
    assert r["changepoint_day"] == d0 + datetime.timedelta(days=39)
    assert r["n_days"] == 80
    # |S| at the shift = 40 days * |100 - 150| = 2000
    assert abs(r["max_abs_cusum"] - 2000.0) < 1e-6


def test_cusum_matches_numpy_argmax_on_real_data(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import cusum_changepoint_revenue

    [r] = cusum_changepoint_revenue(spark, SF_DIR).collect()
    od = load_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    daily = od.groupby("o_orderdate")["o_totalprice"].sum().round(2).sort_index()
    s = (daily - daily.mean()).cumsum()
    assert r["changepoint_day"] == s.abs().idxmax()
    assert abs(r["max_abs_cusum"] - abs(s).max()) < 1e-2


# ---------- Hypothesis invariants for the distributed statistics ----------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pytest as _pytest

    @_pytest.fixture(scope="session")
    def _spark_holder(spark):
        return spark

    def _events_df(spark, vals):
        import datetime

        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            (i, t0 + datetime.timedelta(seconds=i), i % 7,
             "purchase" if y else "view", float(v), "{}")
            for i, (v, y) in enumerate(vals)
        ]
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
                  " event_type string, value double, props string"
        )

    @settings(max_examples=6, deadline=None)
    @given(
        vals=st.lists(
            st.tuples(
                st.integers(min_value=-50, max_value=50),
                st.booleans(),
            ),
            min_size=8,
            max_size=60,
        ).filter(
            lambda v: 0 < sum(y for _, y in v) < len(v)
        ),
    )
    def test_auc_invariant_under_monotone_score_transform(_spark_holder, vals):
        """AUC is a rank statistic: applying a strictly increasing
        transform (2x+1000) to every score must not change it."""
        import importlib as _il
        from unittest.mock import patch as _patch

        from zoom_spark.queries.training_prep import roc_auc_purchase_value

        spark = _spark_holder
        mod = _il.import_module(roc_auc_purchase_value.__module__)
        df1 = _events_df(spark, vals)
        df2 = _events_df(spark, [(2 * v + 1000, y) for v, y in vals])
        with _patch.object(mod, "load_table", lambda spark, sf, t: df1):
            [r1] = roc_auc_purchase_value(spark, SF_DIR).collect()
        with _patch.object(mod, "load_table", lambda spark, sf, t: df2):
            [r2] = roc_auc_purchase_value(spark, SF_DIR).collect()
        assert r1["auc"] == r2["auc"]
        assert 0.0 <= r1["auc"] <= 1.0

    @settings(max_examples=6, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=-30, max_value=30),
            min_size=10,
            max_size=60,
        ),
    )
    def test_ks_bounds_and_weekday_self_identity(_spark_holder, vals):
        """0 <= D <= 1 always; identical weekend/weekday samples give
        D == 0 (every value planted once on a weekend day and once on
        a weekday)."""
        import datetime
        import importlib as _il
        from unittest.mock import patch as _patch

        from zoom_spark.queries.training_prep import ks_test_weekend_value

        spark = _spark_holder
        mod = _il.import_module(ks_test_weekend_value.__module__)
        rows = []
        k = 0
        for v in vals:
            # Jan 6 2024 is wd 5 (weekend anchor math), Jan 2 is wd 1
            rows.append((k, datetime.datetime(2024, 1, 6, 0, 0, k % 60,
                                              k // 60), 1, "view",
                         float(v), "{}"))
            k += 1
            rows.append((k, datetime.datetime(2024, 1, 2, 0, 0, k % 60,
                                              k // 60), 1, "view",
                         float(v), "{}"))
            k += 1
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
                  " event_type string, value double, props string"
        )
        with _patch.object(mod, "load_table", lambda spark, sf, t: df):
            [r] = ks_test_weekend_value(spark, SF_DIR).collect()
        assert r["ks_d"] == 0.0
        assert r["p_value"] == 2.0

except ImportError:  # pragma: no cover
    pass


# ---------- R104 isotonic calibration ----------


def _pav_naive(rates, weights):
    """Independent O(n^2) referee: repeatedly find ANY adjacent
    violator and merge, until monotone (different algorithm from the
    operator's single-pass stack)."""
    blocks = [[v, w] for v, w in zip(rates, weights)]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            if blocks[i][0] > blocks[i + 1][0] + 1e-15:
                v1, w1 = blocks[i]
                v2, w2 = blocks[i + 1]
                blocks[i] = [(v1 * w1 + v2 * w2) / (w1 + w2), w1 + w2]
                del blocks[i + 1]
                changed = True
                break
    out = []
    k = 0
    for v, w in blocks:
        # expand back: each merged block covers its constituent buckets
        total = w
        while total > 1e-9 and k < len(weights):
            out.append(v)
            total -= weights[k]
            k += 1
    return out


def test_isotonic_matches_naive_pav_and_is_monotone(spark):
    from zoom_spark.queries.training_prep import isotonic_calibration

    rows = isotonic_calibration(spark, SF_DIR).collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["grp"], []).append(r)
    assert len(by_grp) == 2
    for grp, rs in by_grp.items():
        rs.sort(key=lambda r: r["bucket"])
        fitted = [r["calibrated"] for r in rs]
        # monotone non-decreasing
        assert all(a <= b + 1e-9 for a, b in zip(fitted, fitted[1:]))
        # matches the independent referee
        ref = _pav_naive(
            [r["raw_rate"] for r in rs], [float(r["n"]) for r in rs]
        )
        assert len(ref) == len(fitted)
        for a, b in zip(fitted, ref):
            assert abs(a - b) < 1e-5
        # weighted mean is preserved by pooling
        wsum = sum(r["n"] for r in rs)
        assert abs(
            sum(r["calibrated"] * r["n"] for r in rs) / wsum
            - sum(r["raw_rate"] * r["n"] for r in rs) / wsum
        ) < 1e-4


# ---------- R105 stratified k-fold ----------


def test_kfold_balance_within_one_per_stratum(spark):
    from zoom_spark.queries.training_prep import KFOLD_K, stratified_kfold_docs

    rows = stratified_kfold_docs(spark, SF_DIR).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], {})[r["fold"]] = r["n_docs"]
    for src, folds in by_source.items():
        assert set(folds) == set(range(KFOLD_K)), src
        sizes = list(folds.values())
        assert max(sizes) - min(sizes) <= 1, (src, sizes)  # exact balance


def test_kfold_assignment_is_deterministic(spark):
    from zoom_spark.queries.training_prep import stratified_kfold_docs

    a = sorted(map(tuple, stratified_kfold_docs(spark, SF_DIR).collect()))
    b = sorted(map(tuple, stratified_kfold_docs(spark, SF_DIR).collect()))
    assert a == b


# ---------- R106 NDCG ----------


def test_ndcg_matches_numpy_referee(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import NDCG_K, ndcg_value_ranking

    [r] = ndcg_value_ranking(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "value", "event_type"
    ).toPandas()
    ev["rel"] = (ev["event_type"] == "purchase").astype(float)
    scores, n_users = [], 0
    for uid, g in ev.groupby("user_id"):
        n_users += 1
        act = g.sort_values(["value", "event_id"], ascending=[False, True])
        ide = g.sort_values(["rel", "event_id"], ascending=[False, True])
        dcg = sum(
            rel / np.log2(i + 2)
            for i, rel in enumerate(act["rel"].head(NDCG_K))
        )
        idcg = sum(
            rel / np.log2(i + 2)
            for i, rel in enumerate(ide["rel"].head(NDCG_K))
        )
        if idcg > 0:
            scores.append(dcg / idcg)
    assert r["n_users"] == n_users
    assert r["n_scored"] == len(scores)
    assert abs(r["mean_ndcg"] - np.mean(scores)) < 1e-5


def test_ndcg_is_one_when_score_equals_relevance(spark):
    import datetime
    from zoom_spark.queries.training_prep import ndcg_value_ranking

    mod = importlib.import_module(ndcg_value_ranking.__module__)
    t0 = datetime.datetime(2024, 1, 1)
    # one user, purchases have the highest scores -> perfect ranking
    rows = [
        (i, t0, 1, "purchase" if i < 3 else "view",
         100.0 - i, "{}")
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string"
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        [r] = ndcg_value_ranking(spark, SF_DIR).collect()
    assert r["mean_ndcg"] == 1.0


# ---------- R107 source vocab Jaccard ----------


def test_source_jaccard_matches_python_sets(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import source_vocab_jaccard

    rows = source_vocab_jaccard(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "text"
    ).toPandas()
    vocab = {}
    for _, r in docs.iterrows():
        vocab.setdefault(r["source"], set()).update(
            w for w in r["text"].split(" ") if w
        )
    srcs = sorted(vocab)
    expect_pairs = {(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]}
    got_pairs = {(r["s1"], r["s2"]) for r in rows}
    # only intersecting pairs appear; every reported one must be correct
    assert got_pairs <= expect_pairs
    for r in rows:
        a, b = vocab[r["s1"]], vocab[r["s2"]]
        inter = len(a & b)
        assert r["n_inter"] == inter
        assert r["n1"] == len(a) and r["n2"] == len(b)
        assert abs(r["jaccard"] - round(inter / len(a | b), 6)) < 1e-9


# ---------- R108 compression ratio ----------


def test_compression_ratio_matches_direct_zlib_and_orders_repetition(spark):
    import zlib
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import compression_ratio_quality

    rows = {r["doc_id"]: r for r in
            compression_ratio_quality(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).toPandas()
    for _, d in docs.iterrows():
        raw = d["text"].encode()
        r = rows[d["doc_id"]]
        assert r["raw_bytes"] == len(raw)
        assert r["comp_bytes"] == len(zlib.compress(raw, 6))
        assert abs(r["ratio"] - round(r["comp_bytes"] / r["raw_bytes"], 6)) < 1e-9


def test_compression_ratio_repetitive_text_compresses_harder(spark):
    from zoom_spark.queries.training_prep import compression_ratio_quality

    uniq = " ".join(f"word{i}x{i*7%13}" for i in range(200))
    rep = "the same phrase again " * 50
    out = {r["doc_id"]: r for r in _with_docs(
        spark, [(0, uniq), (1, rep.strip())], compression_ratio_quality
    )}
    assert out[1]["ratio"] < out[0]["ratio"] * 0.5


# ---------- R109 PSI ----------


def test_psi_zero_for_identical_distributions_and_nonneg_real(spark):
    import datetime
    from zoom_spark.queries.training_prep import psi_value_drift

    [r] = psi_value_drift(spark, SF_DIR).collect()
    assert r["psi"] >= 0.0  # every PSI term is sign-consistent
    mod = importlib.import_module(psi_value_drift.__module__)
    rows = []
    k = 0
    for v in range(100):
        rows.append((k, datetime.datetime(2024, 1, 6, 0, k % 60, k // 60),
                     1, "view", float(v), "{}"))  # weekend
        k += 1
        rows.append((k, datetime.datetime(2024, 1, 2, 0, k % 60, k // 60),
                     1, "view", float(v), "{}"))  # weekday
        k += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string"
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        [r0] = psi_value_drift(spark, SF_DIR).collect()
    assert r0["psi"] == 0.0


def test_psi_detects_planted_shift(spark):
    import datetime
    from zoom_spark.queries.training_prep import psi_value_drift

    mod = importlib.import_module(psi_value_drift.__module__)
    rows = []
    k = 0
    for v in range(200):
        rows.append((k, datetime.datetime(2024, 1, 2, 0, k % 60, k // 60),
                     1, "view", float(v % 100), "{}"))  # weekday ref: 0..99
        k += 1
        rows.append((k, datetime.datetime(2024, 1, 6, 0, k % 60, k // 60),
                     1, "view", float(v % 100 + 50), "{}"))  # weekend: +50
        k += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string"
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        [r] = psi_value_drift(spark, SF_DIR).collect()
    assert r["psi"] > 0.25  # the "significant shift" threshold


# ---------- R110 diversity card ----------


def test_diversity_card_uniform_and_skewed(spark):
    from zoom_spark.queries.training_prep import corpus_diversity_card

    # uniform 4 sources x 5 docs -> H = ln 4, effective = 4
    rows = [(i, f"text {i}") for i in range(20)]
    df = spark.createDataFrame(
        [(i, t, "en", f"s{i % 4}", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    mod = importlib.import_module(corpus_diversity_card.__module__)
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        [r] = corpus_diversity_card(spark, SF_DIR).collect()
    import math

    assert r["n_sources"] == 4
    assert abs(r["shannon_nats"] - math.log(4)) < 1e-4
    assert abs(r["effective_sources"] - 4.0) < 1e-3
    assert abs(r["inv_simpson"] - 4.0) < 1e-3
    # heavy skew: 17 docs in one source, 1 in each of 3 others
    df2 = spark.createDataFrame(
        [(i, f"t{i}", "en", "big" if i < 17 else f"s{i}", 3)
         for i in range(20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df2):
        [r2] = corpus_diversity_card(spark, SF_DIR).collect()
    assert r2["n_sources"] == 4
    assert r2["effective_sources"] < 2.0  # mixture is worth < 2 domains


# ---------- R111 containment ----------


def test_containment_asymmetry_on_planted_subset(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import containment_neardup_pairs

    CONT_OFFSET = (
        load_table(spark, SF_DIR, "documents").agg({"doc_id": "max"}).collect()[0][0]
        + 1
    )
    rows = containment_neardup_pairs(spark, SF_DIR).collect()
    by_pair = {(r["id_a"], r["id_b"]): r for r in rows}
    # every original is FULLY contained in its tail-extended clone
    origs = {a for (a, b) in by_pair if b == a + CONT_OFFSET}
    assert origs, "planted clones must surface"
    for a in origs:
        fwd = by_pair[(a, a + CONT_OFFSET)]
        assert fwd["containment"] == 1.0
        rev = by_pair.get((a + CONT_OFFSET, a))
        if rev is not None:  # clone -> orig direction is strictly smaller
            assert rev["containment"] < 1.0
            assert rev["n_shared"] == fwd["n_shared"]


def test_containment_matches_python_sets(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import (
        CONT_MIN,
        CONT_W,
        containment_neardup_pairs,
    )

    rows = containment_neardup_pairs(spark, SF_DIR).collect()
    CONT_OFFSET = (
        load_table(spark, SF_DIR, "documents").agg({"doc_id": "max"}).collect()[0][0]
        + 1
    )
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).toPandas()
    sets = {}
    for _, d in docs.iterrows():
        for did, text in (
            (d["doc_id"], d["text"]),
            (d["doc_id"] + CONT_OFFSET,
             d["text"] + " appended tail marker words"),
        ):
            ws = [w for w in text.split(" ") if w]
            sets[did] = {
                " ".join(ws[i : i + CONT_W])
                for i in range(len(ws) - CONT_W + 1)
            }
    expect = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a != b and sa:
                inter = len(sa & sb)
                if inter / len(sa) >= CONT_MIN:
                    expect[(a, b)] = (inter, len(sa))
    got = {(r["id_a"], r["id_b"]): (r["n_shared"], r["n_a"]) for r in rows}
    assert got == expect


# ---------- R112 MRR ----------


def test_mrr_matches_pandas_referee(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import mrr_value_ranking

    [r] = mrr_value_ranking(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "value", "event_type"
    ).toPandas()
    total = 0.0
    n_rel = 0
    users = ev["user_id"].nunique()
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["value", "event_id"], ascending=[False, True])
        rel = (g["event_type"] == "purchase").to_numpy()
        if rel.any():
            n_rel += 1
            total += 1.0 / (int(np.argmax(rel)) + 1)
    assert r["n_users"] == users
    assert r["n_with_relevant"] == n_rel
    assert abs(r["mrr"] - total / users) < 1e-6


# ---------- R113 vocab coverage ----------


def test_vocab_coverage_matches_numpy_zipf_walk(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import (
        VOCAB_COVERAGE_TARGETS,
        vocab_coverage_sizes,
    )

    [r] = vocab_coverage_sizes(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select("text").toPandas()
    from collections import Counter

    c = Counter()
    for t in docs["text"]:
        c.update(w for w in t.split(" ") if w)
    freqs = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(v for _, v in freqs)
    assert r["vocab_size"] == len(freqs)
    assert r["total_tokens"] == total
    cum = 0
    knees = {}
    for i, (_, v) in enumerate(freqs, start=1):
        cum += v
        for q in VOCAB_COVERAGE_TARGETS:
            key = f"k_{int(q * 100)}"
            if key not in knees and cum >= q * total:
                knees[key] = i
    for key, expected in knees.items():
        assert r[key] == expected, key
    assert r["k_50"] <= r["k_90"] <= r["k_99"] <= r["vocab_size"]


# ---------- R114 split leakage ----------


def test_split_leakage_matches_pandas_referee(spark):
    import pandas as pd
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import (
        LEAK_SPLIT_DAY,
        split_leakage_report,
    )

    [r] = split_leakage_report(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts").toPandas()
    ev["part"] = (ev["ts"].dt.normalize() >= pd.Timestamp(LEAK_SPLIT_DAY)).astype(int)
    g = ev.groupby("user_id")["part"].agg(["sum", "count"])
    n_train = g["count"] - g["sum"]
    n_test = g["sum"]
    leaking = ((n_train > 0) & (n_test > 0)).sum()
    assert r["n_users"] == len(g)
    assert r["n_leaking_users"] == leaking
    assert abs(r["user_leak_rate"] - leaking / len(g)) < 1e-6
    assert r["n_test_events"] == n_test.sum()
    seen = n_test[n_train > 0].sum()
    assert abs(r["test_event_seen_user_rate"] - seen / n_test.sum()) < 1e-6


def test_split_leakage_zero_for_disjoint_users(spark):
    import datetime
    from zoom_spark.queries.training_prep import split_leakage_report

    mod = importlib.import_module(split_leakage_report.__module__)
    rows = []
    for i in range(40):
        uid = i
        day = datetime.datetime(2024, 1, 5) if i < 20 else datetime.datetime(2024, 1, 25)
        rows.append((i, day, uid, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string"
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        [r] = split_leakage_report(spark, SF_DIR).collect()
    assert r["n_leaking_users"] == 0
    assert r["user_leak_rate"] == 0.0
    assert r["test_event_seen_user_rate"] == 0.0


# ---------- R115 linear attribution ----------


def test_linear_attribution_credit_sums_to_attributed_purchases(spark):
    import pandas as pd
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import (
        ATTR_WINDOW_DAYS,
        linear_touch_attribution,
    )

    rows = linear_touch_attribution(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "event_type"
    ).toPandas()
    purchases = ev[ev["event_type"] == "purchase"]
    touches = ev[ev["event_type"].isin(["click", "view"])]
    total_credit = {}
    n_attr = 0
    for _, p in purchases.iterrows():
        w = touches[
            (touches["user_id"] == p["user_id"])
            & (touches["ts"] < p["ts"])
            & (touches["ts"] >= p["ts"] - pd.Timedelta(days=ATTR_WINDOW_DAYS))
        ]
        if len(w):
            n_attr += 1
            for et, c in w["event_type"].value_counts().items():
                total_credit[et] = total_credit.get(et, 0.0) + c / len(w)
    got = {r["event_type"]: r["credit"] for r in rows}
    for et, c in total_credit.items():
        assert abs(got[et] - c) < 1e-3, et
    # linear attribution conserves credit: one unit per attributed purchase
    assert abs(sum(got.values()) - n_attr) < 1e-3


def test_linear_attribution_planted_shares(spark):
    import datetime
    from zoom_spark.queries.training_prep import linear_touch_attribution

    mod = importlib.import_module(linear_touch_attribution.__module__)
    t0 = datetime.datetime(2024, 1, 10)
    rows = [
        (1, t0 - datetime.timedelta(days=1), 1, "click", 1.0, "{}"),
        (2, t0 - datetime.timedelta(days=2), 1, "view", 1.0, "{}"),
        (3, t0 - datetime.timedelta(days=3), 1, "view", 1.0, "{}"),
        (4, t0, 1, "purchase", 1.0, "{}"),
        (5, t0 - datetime.timedelta(days=30), 2, "click", 1.0, "{}"),  # stale
        (6, t0, 2, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string"
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        out = {r["event_type"]: r for r in
               linear_touch_attribution(spark, SF_DIR).collect()}
    assert abs(out["click"]["credit"] - 1 / 3) < 1e-6
    assert abs(out["view"]["credit"] - 2 / 3) < 1e-6
    # user 2's stale click gets nothing (outside the window)
    assert out["click"]["n_touches"] == 1


# ---------- R116 churn labels ----------


def test_churn_labels_windows_are_disjoint_and_correct(spark):
    import pandas as pd
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import CHURN_CUTOFF, churn_labels

    rows = {r["user_id"]: r for r in churn_labels(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "value"
    ).toPandas()
    cutoff = pd.Timestamp(CHURN_CUTOFF)
    for uid, g in ev.groupby("user_id"):
        obs = g[g["ts"].dt.normalize() < cutoff]
        out = g[g["ts"].dt.normalize() >= cutoff]
        if len(obs) == 0:
            assert uid not in rows  # nothing to predict from
            continue
        r = rows[uid]
        assert r["n_obs"] == len(obs)
        assert abs(r["avg_value_obs"] - obs["value"].mean()) < 1e-5
        assert r["churned"] == int(len(out) == 0)


def test_churn_planted_churner_and_stayer(spark):
    import datetime
    from zoom_spark.queries.training_prep import churn_labels

    mod = importlib.import_module(churn_labels.__module__)
    rows = [
        (1, datetime.datetime(2024, 1, 5), 1, "view", 10.0, "{}"),   # churner
        (2, datetime.datetime(2024, 1, 5), 2, "view", 20.0, "{}"),   # stayer
        (3, datetime.datetime(2024, 1, 25), 2, "view", 30.0, "{}"),
        (4, datetime.datetime(2024, 1, 25), 3, "view", 40.0, "{}"),  # no obs
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string"
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        out = {r["user_id"]: r for r in churn_labels(spark, SF_DIR).collect()}
    assert out[1]["churned"] == 1
    assert out[2]["churned"] == 0
    assert out[2]["avg_value_obs"] == 20.0  # outcome value NOT leaked
    assert 3 not in out


# ---------- R117 Good-Turing ----------


def test_good_turing_matches_counter_referee(spark):
    from collections import Counter

    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import good_turing_unseen_mass

    rows = {r["source"]: r for r in
            good_turing_unseen_mass(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "text"
    ).toPandas()
    for src, g in docs.groupby("source"):
        c = Counter()
        for t in g["text"]:
            c.update(w for w in t.split(" ") if w)
        n = sum(c.values())
        n1 = sum(1 for v in c.values() if v == 1)
        r = rows[src]
        assert r["n_tokens"] == n
        assert r["vocab"] == len(c)
        assert r["n_singletons"] == n1
        assert abs(r["p_unseen"] - round(n1 / n, 6)) < 1e-9


def test_good_turing_extremes(spark):
    from zoom_spark.queries.training_prep import good_turing_unseen_mass

    # all-singleton source -> p_unseen = 1; all-repeated -> near 0
    rows = [
        (0, " ".join(f"u{i}" for i in range(30))),   # 30 singletons
        (1, " ".join(["same"] * 30)),                 # one type, tf=30
    ]
    df = spark.createDataFrame(
        [(i, t, "en", f"s{i}", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    mod = importlib.import_module(good_turing_unseen_mass.__module__)
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        out = {r["source"]: r for r in
               good_turing_unseen_mass(spark, SF_DIR).collect()}
    assert out["s0"]["p_unseen"] == 1.0
    assert out["s1"]["p_unseen"] == 0.0


# ---------- R118 Simpson's paradox ----------


def test_simpsons_check_matches_numpy_slopes(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import simpsons_paradox_check

    rows = simpsons_paradox_check(spark, SF_DIR).collect()
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_discount", "l_extendedprice"
    ).toPandas()
    slope_all = np.polyfit(li["l_discount"], li["l_extendedprice"], 1)[0]
    for r in rows:
        g = li[li["l_returnflag"] == r["l_returnflag"]]
        slope = np.polyfit(g["l_discount"], g["l_extendedprice"], 1)[0]
        assert abs(r["slope"] - slope) < 1e-2
        assert abs(r["slope_all"] - slope_all) < 1e-2
        assert r["sign_reversed"] == int(r["slope"] * r["slope_all"] < 0)


def test_simpsons_planted_reversal(spark):
    from zoom_spark.queries.training_prep import simpsons_paradox_check

    mod = importlib.import_module(simpsons_paradox_check.__module__)
    # two strata with NEGATIVE within-group trend but offset so the
    # pooled trend is positive (the textbook paradox construction)
    rows = []
    k = 0
    for grp, x0, y0 in (("A", 0.0, 0.0), ("B", 5.0, 50.0)):
        for i in range(30):
            x = x0 + i / 10.0
            y = y0 - 2.0 * (i / 10.0)  # within-group slope -2
            rows.append((k, grp, float(x), float(y)))
            k += 1
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_returnflag string, l_discount double,"
              " l_extendedprice double"
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        out = simpsons_paradox_check(spark, SF_DIR).collect()
    assert all(r["sign_reversed"] == 1 for r in out)
    assert all(r["slope"] < 0 < r["slope_all"] for r in out)


# ---------- R119 Zipf fit ----------


def test_zipf_fit_matches_numpy_and_is_negative(spark):
    from collections import Counter

    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import zipf_exponent_fit

    [r] = zipf_exponent_fit(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select("text").toPandas()
    c = Counter()
    for t in docs["text"]:
        c.update(w for w in t.split(" ") if w)
    freqs = sorted(c.values(), reverse=True)
    lx = np.log(np.arange(1, len(freqs) + 1))
    ly = np.log(np.array(freqs, dtype=float))
    slope, _ = np.polyfit(lx, ly, 1)
    r2 = np.corrcoef(lx, ly)[0, 1] ** 2
    assert r["vocab"] == len(freqs)
    assert abs(r["zipf_slope"] - slope) < 1e-4
    assert abs(r["fit_r2"] - r2) < 1e-4
    assert r["zipf_slope"] < 0


# ---------- R120 centroid cosine matrix ----------


def test_centroid_cosine_matches_numpy(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import centroid_cosine_matrix

    rows = centroid_cosine_matrix(spark, SF_DIR).collect()
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "label", "embedding"
    ).toPandas()
    cents = {}
    for lab, g in emb.groupby("label"):
        m = np.stack(g["embedding"].to_numpy()).astype(float).mean(axis=0)
        cents[lab] = np.round(m, 6)  # the query rounds per-dim first
    for r in rows:
        a, b = cents[r["l1"]], cents[r["l2"]]
        cos = a @ b / np.sqrt((a @ a) * (b @ b))
        assert abs(r["cosine"] - cos) < 1e-5
        assert -1.0 <= r["cosine"] <= 1.0
    n = len(cents)
    assert len(rows) == n * (n - 1) // 2


# ---------- R121 funnel latency ----------


def test_funnel_latency_matches_pandas_referee(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import funnel_latency_percentiles

    [r] = funnel_latency_percentiles(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_type"
    ).toPandas()
    lat = []
    for uid, g in ev.groupby("user_id"):
        s = g[g["event_type"] == "signup"]["ts"].min()
        p = g[g["event_type"] == "purchase"]["ts"].min()
        import pandas as pd

        if pd.notna(s) and pd.notna(p) and p >= s:
            lat.append((p - s).total_seconds() / 3600.0)
    assert r["n_converted"] == len(lat)
    assert abs(r["p50_hours"] - np.percentile(lat, 50)) < 1e-3
    assert abs(r["p90_hours"] - np.percentile(lat, 90)) < 1e-3
    assert abs(r["p99_hours"] - np.percentile(lat, 99)) < 1e-3
    assert r["p50_hours"] <= r["p90_hours"] <= r["p99_hours"]


# ---------- R122 duplication dashboard ----------


def test_source_duplication_report_planted_copies(spark):
    from zoom_spark.queries.training_prep import source_duplication_report

    mod = importlib.import_module(source_duplication_report.__module__)
    rows = [
        (0, "shared copy text", "en", "sA", 16),
        (1, "shared copy text", "en", "sB", 16),   # cross-source copy
        (2, "unique a", "en", "sA", 8),
        (3, "within dup", "en", "sB", 10),
        (4, "within dup", "en", "sB", 10),         # within-source copy
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long",
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        out = {r["source"]: r for r in
               source_duplication_report(spark, SF_DIR).collect()}
    assert out["sA"]["n_docs"] == 2
    assert out["sA"]["n_duplicated"] == 1      # the shared copy
    assert out["sA"]["n_cross_source"] == 1
    assert out["sB"]["n_docs"] == 3
    assert out["sB"]["n_duplicated"] == 3      # shared + the within pair
    assert out["sB"]["n_cross_source"] == 1
    assert abs(out["sB"]["dup_rate"] - 1.0) < 1e-9


# ---------- R123 Kendall tau ----------


def test_kendall_tau_matches_scipy_free_referee(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import TAU_K, kendall_tau_topk

    [r] = kendall_tau_topk(spark, SF_DIR).collect()
    od = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    ).toPandas()
    g = od.groupby("o_custkey").agg(
        spend=("o_totalprice", "sum"), last=("o_orderdate", "max")
    ).reset_index()
    g["spend"] = g["spend"].round(2)
    g = g.sort_values(["spend", "o_custkey"], ascending=[False, True])
    g["r1"] = range(1, len(g) + 1)
    g = g.sort_values(["last", "o_custkey"], ascending=[False, True])
    g["r2"] = range(1, len(g) + 1)
    top = g[g["r1"] <= TAU_K]
    r1 = top["r1"].to_numpy()
    r2 = top["r2"].to_numpy()
    conc = 0
    n = 0
    for i in range(len(top)):
        for j in range(i + 1, len(top)):
            n += 1
            conc += int((r1[i] - r1[j]) * (r2[i] - r2[j]) > 0)
    assert r["n_pairs"] == n == TAU_K * (TAU_K - 1) // 2
    assert r["n_concordant"] == conc
    assert abs(r["tau"] - (2 * conc - n) / n) < 1e-6
    assert -1.0 <= r["tau"] <= 1.0


# ---------- R124 burstiness ----------


def test_burstiness_matches_pandas_and_poisson_planted(spark):
    import pandas as pd
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import event_burstiness

    rows = {r["event_type"]: r for r in
            event_burstiness(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events").select("event_type", "ts").toPandas()
    ev["day"] = ev["ts"].dt.date
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("day").size()
        r = rows[et]
        assert r["n_days"] == len(daily)
        assert abs(r["mean_daily"] - daily.mean()) < 1e-4
        assert abs(r["var_daily"] - daily.var(ddof=1)) < 1e-4
        assert abs(r["fano"] - daily.var(ddof=1) / daily.mean()) < 1e-4


def test_burstiness_constant_series_fano_zero(spark):
    import datetime
    from zoom_spark.queries.training_prep import event_burstiness

    mod = importlib.import_module(event_burstiness.__module__)
    rows = []
    k = 0
    for d in range(10):          # exactly 3 events every day
        for j in range(3):
            rows.append((k, datetime.datetime(2024, 1, 1 + d, j), 1,
                         "view", 1.0, "{}"))
            k += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string"
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        [r] = event_burstiness(spark, SF_DIR).collect()
    assert r["fano"] == 0.0  # perfectly regular arrivals


# ---------- R125 bigram entropy ----------


def test_bigram_entropy_matches_counter_referee(spark):
    import math
    import re as _re
    from collections import Counter

    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import bigram_entropy_rate

    [r] = bigram_entropy_rate(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select("text").toPandas()
    bi = Counter()
    for t in docs["text"]:
        ws = [w for w in _re.split(r"\s+", t.strip().lower()) if w]
        bi.update(zip(ws, ws[1:]))
    uni = Counter()
    for (w1, _), n in bi.items():
        uni[w1] += n
    total = sum(bi.values())
    h = -sum((n / total) * math.log(n / uni[w1]) for (w1, _), n in bi.items())
    assert r["n_bigrams"] == total
    assert r["distinct_bigrams"] == len(bi)
    assert abs(r["cond_entropy_nats"] - h) < 1e-4


def test_bigram_entropy_zero_for_deterministic_chain(spark):
    from zoom_spark.queries.training_prep import bigram_entropy_rate

    # "a b a b a b ..." -> w2 is fully determined by w1 -> H = 0
    rows = [(0, "a b " * 50), (1, "a b " * 30)]
    out = _with_docs(spark, [(i, t.strip()) for i, t in rows],
                     bigram_entropy_rate)
    assert out[0]["cond_entropy_nats"] == 0.0


# ---------- R126 Lorenz curve ----------


def test_lorenz_curve_matches_numpy_and_is_convex(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import (
        LORENZ_POINTS,
        lorenz_curve_spend,
    )

    rows = sorted(
        lorenz_curve_spend(spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    od = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    s = np.sort(
        od.groupby("o_custkey")["o_totalprice"].sum().round(2).to_numpy()
    )
    n, total = len(s), s.sum()
    shares = []
    for p in range(1, LORENZ_POINTS + 1):
        k = int(np.floor(p * n / LORENZ_POINTS))
        shares.append(s[:k].sum() / total)
    got = [r["spend_share"] for r in rows]
    assert len(got) == LORENZ_POINTS
    for a, b in zip(got, shares):
        assert abs(a - b) < 1e-4
    # Lorenz curve properties: increasing, below the diagonal, ends at 1
    assert all(a <= b + 1e-9 for a, b in zip(got, got[1:]))
    for i, v in enumerate(got[:-1], start=1):
        assert v <= i / LORENZ_POINTS + 1e-9
    assert abs(got[-1] - 1.0) < 1e-6


# ---------- R127 PRF ----------


def test_prf_matches_numpy_confusion(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import (
        PRF_THRESHOLDS,
        prf_at_thresholds,
    )

    rows = {r["thr"]: r for r in prf_at_thresholds(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events").select(
        "value", "event_type"
    ).toPandas()
    v = ev["value"].to_numpy()
    y = (ev["event_type"] == "purchase").to_numpy()
    for thr in PRF_THRESHOLDS:
        pred = v >= thr
        tp = int((pred & y).sum())
        fp = int((pred & ~y).sum())
        fn = int((~pred & y).sum())
        r = rows[thr]
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, fn)
        assert abs(r["precision"] - tp / (tp + fp)) < 1e-6
        assert abs(r["recall"] - tp / (tp + fn)) < 1e-6
        assert abs(r["f1"] - 2 * tp / (2 * tp + fp + fn)) < 1e-6


# ---------- R128 Cramér's V ----------


def test_cramers_v_consistent_with_chi_square_query(spark):
    from zoom_spark.queries.training_prep import cramers_v_type_weekday
    from zoom_spark.queries.stats_suite import chi_square_independence

    [v] = cramers_v_type_weekday(spark, SF_DIR).collect()
    [chi] = chi_square_independence(spark, SF_DIR).collect()
    assert abs(v["chi2"] - chi["chi2"]) < 1e-3  # same contingency
    assert v["n"] == chi["n"]
    import math

    r_c_min = 5  # 5 event types < 7 weekdays
    expect = math.sqrt(v["chi2"] / (v["n"] * (r_c_min - 1)))
    assert abs(v["cramers_v"] - expect) < 1e-5
    assert 0.0 <= v["cramers_v"] <= 1.0


def test_cramers_v_is_one_for_perfect_association(spark):
    import datetime
    from zoom_spark.queries.training_prep import cramers_v_type_weekday

    mod = importlib.import_module(cramers_v_type_weekday.__module__)
    # event_type fully determined by weekday (2 types x 2 days)
    rows = []
    k = 0
    for d, et in ((1, "view"), (2, "click")):  # Jan 2 -> wd1, Jan 3 -> wd2
        for i in range(20):
            rows.append((k, datetime.datetime(2024, 1, 1 + d, 0, 0, i), 1,
                         et, 1.0, "{}"))
            k += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string"
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        [r] = cramers_v_type_weekday(spark, SF_DIR).collect()
    assert r["cramers_v"] == 1.0


# ---------- R129 McNemar ----------


def test_mcnemar_matches_numpy_referee(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import (
        MCN_T1,
        MCN_T2,
        mcnemar_paired_classifiers,
    )

    [r] = mcnemar_paired_classifiers(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").select(
        "value", "event_type"
    ).toPandas()
    v = ev["value"].to_numpy()
    y = (ev["event_type"] == "purchase").to_numpy()
    a = v >= MCN_T1
    b = v >= MCN_T2
    n_b = int(((a == y) & (b != y)).sum())
    n_c = int(((a != y) & (b == y)).sum())
    assert (r["n_b"], r["n_c"]) == (n_b, n_c)
    assert abs(
        r["mcnemar_chi2"] - (abs(n_b - n_c) - 1) ** 2 / (n_b + n_c)
    ) < 1e-6


# ---------- R130 Spearman ----------


def test_spearman_matches_scipy_free_referee(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import spearman_spend_recency

    [r] = spearman_spend_recency(spark, SF_DIR).collect()
    od = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    ).toPandas()
    g = od.groupby("o_custkey").agg(
        spend=("o_totalprice", "sum"), last=("o_orderdate", "max")
    ).reset_index()
    g["spend"] = g["spend"].round(2)
    g = g.sort_values(["spend", "o_custkey"], ascending=[False, True])
    g["r1"] = range(1, len(g) + 1)
    g = g.sort_values(["last", "o_custkey"], ascending=[False, True])
    g["r2"] = range(1, len(g) + 1)
    rho = np.corrcoef(g["r1"], g["r2"])[0, 1]
    assert r["n"] == len(g)
    assert abs(r["spearman_rho"] - rho) < 1e-5
    assert -1.0 <= r["spearman_rho"] <= 1.0


# ---------- R131 Wilson intervals ----------


def test_wilson_intervals_match_closed_form_and_bound(spark):
    import math

    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import (
        WILSON_Z,
        wilson_conversion_intervals,
    )

    rows = wilson_conversion_intervals(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type"
    ).toPandas()
    conv = ev.groupby("user_id")["event_type"].apply(
        lambda s: int((s == "purchase").any())
    )
    for r in rows:
        users = [u for u in conv.index if u % 4 == r["cohort"]]
        n = len(users)
        k = int(conv[users].sum())
        assert (r["n"], r["k"]) == (n, k)
        p = k / n
        z2 = WILSON_Z ** 2
        center = p + z2 / (2 * n)
        half = WILSON_Z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        denom = 1 + z2 / n
        assert abs(r["ci_lo"] - (center - half) / denom) < 1e-6
        assert abs(r["ci_hi"] - (center + half) / denom) < 1e-6
        assert 0.0 <= r["ci_lo"] <= r["rate"] <= r["ci_hi"] <= 1.0


def test_wilson_never_degenerate_at_extremes(spark):
    import datetime
    from zoom_spark.queries.training_prep import wilson_conversion_intervals

    mod = importlib.import_module(wilson_conversion_intervals.__module__)
    # cohort 0: all converters; cohort 1: none
    rows = []
    k = 0
    for uid in range(8):
        et = "purchase" if uid % 4 == 0 else "view"
        rows.append((k, datetime.datetime(2024, 1, 2), uid, et, 1.0, "{}"))
        k += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string"
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        out = {r["cohort"]: r for r in
               wilson_conversion_intervals(spark, SF_DIR).collect()}
    assert out[0]["rate"] == 1.0 and out[0]["ci_lo"] > 0.2  # not [1,1]
    assert out[0]["ci_hi"] == 1.0
    assert out[1]["rate"] == 0.0 and out[1]["ci_hi"] < 0.8  # not [0,0]
    assert out[1]["ci_lo"] == 0.0


# ---------- R132 Mann-Kendall ----------


def test_mann_kendall_matches_numpy_and_planted_trends(spark):
    import datetime

    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import mann_kendall_revenue_trend

    [r] = mann_kendall_revenue_trend(spark, SF_DIR).collect()
    od = load_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    daily = od.groupby("o_orderdate")["o_totalprice"].sum().round(2).sort_index()
    x = daily.to_numpy()
    s = sum(
        np.sign(x[j] - x[i])
        for i in range(len(x))
        for j in range(i + 1, len(x))
    )
    assert r["n_days"] == len(x)
    assert r["s_stat"] == int(s)
    # planted strictly increasing series -> strongly positive z
    mod = importlib.import_module(mann_kendall_revenue_trend.__module__)
    d0 = datetime.date(2024, 1, 1)
    rows = [(i, d0 + datetime.timedelta(days=i), 100.0 + i)
            for i in range(50)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        [up] = mann_kendall_revenue_trend(spark, SF_DIR).collect()
    n = 50
    assert up["s_stat"] == n * (n - 1) // 2  # every pair concordant
    assert up["z_stat"] > 8.0


# ---------- R133/R134 graph statistics ----------


def _co_purchase_graph(spark):
    from zoom_spark.io import load_table

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).toPandas().drop_duplicates()
    edges = set()
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(g["l_partkey"].unique())
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                edges.add((parts[i], parts[j]))
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return edges, deg


def test_powerlaw_alpha_matches_mle_referee(spark):
    import math
    from zoom_spark.queries.training_prep import (
        PL_DMIN,
        degree_powerlaw_alpha,
    )

    [r] = degree_powerlaw_alpha(spark, SF_DIR).collect()
    edges, deg = _co_purchase_graph(spark)
    tail = [d for d in deg.values() if d >= PL_DMIN]
    alpha = 1 + len(tail) / sum(math.log(d / (PL_DMIN - 0.5)) for d in tail)
    assert r["n_nodes"] == len(deg)
    assert r["n_tail"] == len(tail)
    assert abs(r["alpha"] - alpha) < 1e-5
    assert r["alpha"] > 1.0  # MLE is bounded below by 1


def test_assortativity_matches_numpy_referee(spark):
    from zoom_spark.queries.training_prep import degree_assortativity

    [r] = degree_assortativity(spark, SF_DIR).collect()
    edges, deg = _co_purchase_graph(spark)
    du = [deg[u] for u, v in edges] + [deg[v] for u, v in edges]
    dv = [deg[v] for u, v in edges] + [deg[u] for u, v in edges]
    rho = np.corrcoef(du, dv)[0, 1]
    assert r["n_edges"] == len(edges)
    assert abs(r["assortativity"] - rho) < 1e-5
    assert -1.0 <= r["assortativity"] <= 1.0


# ---------- R135 Theil index ----------


def test_theil_matches_numpy_and_decomposition_bounds(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import theil_index_spend

    [r] = theil_index_spend(spark, SF_DIR).collect()
    od = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    s = od.groupby("o_custkey")["o_totalprice"].sum().round(2).to_numpy()
    mu = s.mean()
    theil = ((s / mu) * np.log(s / mu)).sum() / len(s)
    assert r["n_customers"] == len(s)
    assert abs(r["theil_t"] - theil) < 1e-5
    assert 0.0 <= r["theil_t"] <= np.log(len(s))


def test_theil_zero_for_perfect_equality(spark):
    from zoom_spark.queries.training_prep import theil_index_spend

    mod = importlib.import_module(theil_index_spend.__module__)
    df = spark.createDataFrame(
        [(i, i % 20, 100.0) for i in range(100)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        [r] = theil_index_spend(spark, SF_DIR).collect()
    assert r["theil_t"] == 0.0


# ---------- R136 autocorrelation ----------


def test_acf_matches_numpy_referee(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import (
        ACF_LAGS,
        revenue_autocorrelation,
    )

    rows = {r["lag"]: r for r in
            revenue_autocorrelation(spark, SF_DIR).collect()}
    od = load_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    od["day"] = od["o_orderdate"].astype("datetime64[ns]").dt.date
    daily = od.groupby("day")["o_totalprice"].sum().round(2).sort_index()
    days = daily.index.to_list()
    import datetime

    for k in ACF_LAGS:
        xs, ys = [], []
        dayset = set(days)
        for d in days:
            d2 = d + datetime.timedelta(days=k)
            if d2 in dayset:
                xs.append(daily[d])
                ys.append(daily[d2])
        rho = np.corrcoef(xs, ys)[0, 1]
        r = rows[k]
        assert r["n_pairs"] == len(xs)
        assert abs(r["acf"] - rho) < 1e-5
        assert -1.0 <= r["acf"] <= 1.0


# ---------- R137 cohort LTV ----------


def test_cohort_ltv_monotone_and_matches_pandas(spark):
    import pandas as pd
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import cohort_ltv_curve

    rows = cohort_ltv_curve(spark, SF_DIR).collect()
    od = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).toPandas()
    od["day"] = pd.to_datetime(od["o_orderdate"]).dt.date
    firsts = od.groupby("o_custkey")["day"].min()
    od["cohort"] = od["o_custkey"].map(
        lambda c: firsts[c].strftime("%Y-%m")
    )
    od["age"] = od.apply(
        lambda r: (r["day"].year * 12 + r["day"].month)
        - (firsts[r["o_custkey"]].year * 12 + firsts[r["o_custkey"]].month),
        axis=1,
    )
    sizes = firsts.map(lambda d: d.strftime("%Y-%m")).value_counts()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["month_age"])
        # cumulative LTV per user is non-decreasing within a cohort
        vals = [r["cum_ltv_per_user"] for r in rs]
        assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:]))
        assert rs[0]["cohort_size"] == sizes[cohort]
        # final point equals total cohort revenue / cohort size
        g = od[od["cohort"] == cohort]
        expect_final = round(
            round(
                g.groupby("age")["o_totalprice"].sum().round(2).sum(), 10
            ) / sizes[cohort],
            4,
        )
        assert abs(vals[-1] - expect_final) < 0.01


# ---------- R138 weekday index ----------


def test_weekday_index_averages_to_one_when_balanced(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import weekday_seasonal_index

    rows = weekday_seasonal_index(spark, SF_DIR).collect()
    assert len(rows) == 7
    n_days = {r["wd"]: r["n_days"] for r in rows}
    # weighted by day counts, indices average to exactly 1
    total_days = sum(n_days.values())
    weighted = sum(r["seasonal_index"] * r["n_days"] for r in rows)
    assert abs(weighted / total_days - 1.0) < 1e-4
    od = load_table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    import pandas as pd

    od["day"] = pd.to_datetime(od["o_orderdate"]).dt.date
    daily = od.groupby("day")["o_totalprice"].sum().round(2)
    anchor = pd.Timestamp("1990-01-01").date()
    wd = {d: (d - anchor).days % 7 for d in daily.index}
    mu = daily.mean()
    for r in rows:
        vals = [v for d, v in daily.items() if wd[d] == r["wd"]]
        assert r["n_days"] == len(vals)
        assert abs(r["seasonal_index"] - np.mean(vals) / mu) < 1e-4


# ---------- R139 cluster sampling ----------


def test_cluster_sample_matches_hash_referee(spark):
    import hashlib

    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import (
        CLUSTER_SAMPLE_MOD,
        cluster_sample_lineitems,
    )

    [r] = cluster_sample_lineitems(spark, SF_DIR).collect()
    od = load_table(spark, SF_DIR, "orders").select("o_orderkey").toPandas()
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).toPandas()

    def picked(k):
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
        return h % CLUSTER_SAMPLE_MOD == 0

    chosen = {k for k in od["o_orderkey"] if picked(k)}
    samp = li[li["l_orderkey"].isin(chosen)]
    assert r["n_clusters"] == len(chosen)
    assert r["n_sampled"] == len(samp)
    assert r["n_pop"] == len(li)
    assert abs(r["mean_qty_sample"] - samp["l_quantity"].mean()) < 1e-4
    assert abs(r["mean_qty_pop"] - li["l_quantity"].mean()) < 1e-4
    # cluster design keeps the mean close to the population mean
    assert abs(r["mean_qty_sample"] - r["mean_qty_pop"]) < 2.0


# ---------- R140 capture-recapture ----------


def test_capture_recapture_estimates_true_count(spark):
    from zoom_spark.queries.training_prep import capture_recapture_customers

    [r] = capture_recapture_customers(spark, SF_DIR).collect()
    assert r["m"] <= min(r["n1"], r["n2"])
    # Chapman estimator consistency with the reported counts
    expect = round((r["n1"] + 1) * (r["n2"] + 1) / (r["m"] + 1) - 1)
    assert r["n_hat"] == expect
    # within +-40% of the true count at these capture rates (1/3, 1/4)
    assert 0.6 * r["n_true"] <= r["n_hat"] <= 1.4 * r["n_true"]


# ---------- R143 Kaplan-Meier ----------


def test_kaplan_meier_matches_python_referee(spark):
    import pandas as pd
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import kaplan_meier_conversion

    rows = sorted(
        kaplan_meier_conversion(spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_type"
    ).toPandas()
    ev["day"] = ev["ts"].dt.normalize()
    horizon = ev["day"].max()
    spells = []
    for uid, g in ev.groupby("user_id"):
        first = g["day"].min()
        conv = g.loc[g["event_type"] == "purchase", "day"].min()
        if pd.notna(conv) and conv >= first:
            spells.append(((conv - first).days, 1))
        else:
            spells.append(((horizon - first).days, 0))
    # classic KM walk
    times = sorted({t for t, c in spells if c == 1})
    s = 1.0
    expect = {}
    for t in times:
        n_risk = sum(1 for tt, _ in spells if tt >= t)
        d = sum(1 for tt, c in spells if tt == t and c == 1)
        s *= 1 - d / n_risk
        expect[t] = (d, n_risk, s)
    assert [r["day"] for r in rows] == times
    for r in rows:
        d, n_risk, s = expect[r["day"]]
        assert (r["n_events"], r["n_risk"]) == (d, n_risk)
        assert abs(r["survival"] - s) < 1e-5
    # survival is non-increasing and within [0, 1]
    surv = [r["survival"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))
    assert all(0.0 <= v <= 1.0 for v in surv)


# ---------- R144 ECE ----------


def test_ece_matches_numpy_referee_and_zero_for_perfect(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import (
        ECE_BINS,
        expected_calibration_error,
    )

    [r] = expected_calibration_error(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events").select(
        "value", "event_type"
    ).toPandas()
    p = np.clip(ev["value"].to_numpy() / 100.0, 0, 1)
    y = (ev["event_type"] == "purchase").astype(float).to_numpy()
    bins = np.minimum(np.floor(p * ECE_BINS).astype(int), ECE_BINS - 1)
    ece = 0.0
    for b in np.unique(bins):
        mask = bins == b
        ece += mask.sum() * abs(y[mask].mean() - p[mask].mean())
    ece /= len(p)
    assert r["n"] == len(p)
    assert abs(r["ece"] - ece) < 1e-5
    # perfectly calibrated planted input -> ECE 0
    import datetime

    mod = importlib.import_module(expected_calibration_error.__module__)
    rows2 = []
    k = 0
    # bin centered at 0.25: exactly 1 of 4 events is a purchase
    for i in range(40):
        et = "purchase" if i % 4 == 0 else "view"
        rows2.append((k, datetime.datetime(2024, 1, 2), 1, et, 25.0, "{}"))
        k += 1
    df = spark.createDataFrame(
        rows2, "event_id long, ts timestamp, user_id long, event_type string,"
               " value double, props string"
    )
    with patch.object(mod, "load_table", lambda spark, sf, t: df):
        [r0] = expected_calibration_error(spark, SF_DIR).collect()
    assert r0["ece"] == 0.0


# ---------- R145 G-test collocations ----------


def test_gtest_matches_counter_referee(spark):
    import math
    import re as _re
    from collections import Counter

    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import (
        GTEST_MIN_COUNT,
        gtest_collocations,
    )

    rows = {(r["w1"], r["w2"]): r for r in
            gtest_collocations(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select("text").toPandas()
    bi = Counter()
    for t in docs["text"]:
        ws = [w for w in _re.split(r"\s+", t.strip().lower()) if w]
        bi.update(zip(ws, ws[1:]))
    c1, c2 = Counter(), Counter()
    for (a, b), n in bi.items():
        c1[a] += n
        c2[b] += n
    n_tot = sum(bi.values())
    for (a, b), n11 in bi.items():
        if n11 < GTEST_MIN_COUNT:
            assert (a, b) not in rows
            continue
        n12 = c1[a] - n11
        n21 = c2[b] - n11
        n22 = n_tot - c1[a] - c2[b] + n11
        g2 = 0.0
        for o, rn, cn in (
            (n11, c1[a], c2[b]),
            (n12, c1[a], n_tot - c2[b]),
            (n21, n_tot - c1[a], c2[b]),
            (n22, n_tot - c1[a], n_tot - c2[b]),
        ):
            if o > 0:
                g2 += o * math.log(o * n_tot / (rn * cn))
        g2 *= 2
        r = rows[(a, b)]
        assert r["n11"] == n11
        assert abs(r["g2"] - g2) < 1e-2
        assert r["g2"] >= -1e-9  # G^2 is non-negative


# ---------- R146 Davies-Bouldin ----------


def test_davies_bouldin_matches_numpy_referee(spark):
    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import davies_bouldin_embeddings

    [r] = davies_bouldin_embeddings(spark, SF_DIR).collect()
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "label", "embedding"
    ).toPandas()
    cents, spreads = {}, {}
    for lab, g in emb.groupby("label"):
        X = np.stack(g["embedding"].to_numpy()).astype(float)
        c = np.round(X.mean(axis=0), 6)  # query rounds per-dim
        cents[lab] = c
        spreads[lab] = round(
            float(np.sqrt(((X - c) ** 2).sum(axis=1).mean())), 6
        )
    labs = sorted(cents)
    ratios = []
    for i in labs:
        best = max(
            (spreads[i] + spreads[j]) / np.linalg.norm(cents[i] - cents[j])
            for j in labs
            if j != i
        )
        ratios.append(best)
    assert r["n_clusters"] == len(labs)
    assert abs(r["davies_bouldin"] - np.mean(ratios)) < 1e-4
    assert r["davies_bouldin"] > 0


# ---------- R147 TF-IDF cosine pairs ----------


def test_tfidf_cosine_pairs_match_numpy_referee(spark):
    import math
    import re as _re
    from collections import Counter

    from zoom_spark.io import load_table
    from zoom_spark.queries.training_prep import (
        TFIDF_COS_MIN,
        tfidf_cosine_pairs,
    )

    rows = {(r["id_a"], r["id_b"]): r["cosine"] for r in
            tfidf_cosine_pairs(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).toPandas()
    tfs, df = {}, Counter()
    for _, d in docs.iterrows():
        c = Counter(w for w in d["text"].split(" ") if w)
        tfs[d["doc_id"]] = c
        df.update(c.keys())
    n = len(tfs)
    idf = {w: math.log(n / v) for w, v in df.items()}
    vecs = {
        did: {w: round(tf * idf[w], 6) for w, tf in c.items()}
        for did, c in tfs.items()
    }
    norms = {
        did: math.sqrt(sum(x * x for x in v.values()))
        for did, v in vecs.items()
    }
    import hashlib

    def is_query(did):
        # round 9: the contract is a deterministic md5 query batch
        # (~1/16 of docs) against the corpus
        return int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16) % 16 == 0

    ids = sorted(vecs)
    expect = {}
    for a in ids:
        if not is_query(a):
            continue
        for b in ids:
            if b == a:
                continue
            shared = set(vecs[a]) & set(vecs[b])
            if not shared:
                continue
            dot = sum(vecs[a][w] * vecs[b][w] for w in shared)
            cos = dot / (norms[a] * norms[b])
            if cos >= TFIDF_COS_MIN:
                expect[(a, b)] = round(cos, 6)
    assert set(rows) == set(expect)
    for k, v in expect.items():
        assert abs(rows[k] - v) < 1e-6


# ---------- R148 permutation test ----------


def test_permutation_test_deterministic_and_valid_pvalue(spark):
    from zoom_spark.queries.training_prep import (
        PERM_K,
        permutation_test_weekend,
    )

    [r1] = permutation_test_weekend(spark, SF_DIR).collect()
    [r2] = permutation_test_weekend(spark, SF_DIR).collect()
    assert r1 == r2  # md5 relabelings are deterministic
    assert r1["n_perms"] == PERM_K
    assert 0 <= r1["n_extreme"] <= PERM_K
    # add-one smoothing bounds
    lo = 1.0 / (PERM_K + 1)
    assert lo - 1e-9 <= r1["p_value"] <= 1.0
    assert abs(
        r1["p_value"] - (r1["n_extreme"] + 1) / (PERM_K + 1)
    ) < 1e-6

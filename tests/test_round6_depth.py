"""Independent referees for the round-6 depth operators (R164–R168).

Each test recomputes the answer with a DIFFERENT algorithm/library
(pandas groupby/rolling, pure-Python hashlib) — never the engine's own
plan — per the repo's referee discipline.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from tests.conftest import SF_DIR
from zoom_spark.io import load_table

pytestmark = pytest.mark.usefixtures("spark")


def test_zone_map_prunability_is_sound(spark):
    """R164 soundness: a chunk flagged prunable must contain ZERO rows
    matching the predicate, and scanning only non-prunable chunks must
    return exactly the predicate's full result."""
    from zoom_spark.queries.round6_depth import (
        ZM_PRED_DATE,
        zone_map_skipping_report,
    )

    report = {r["chunk"]: r for r in zone_map_skipping_report(spark, SF_DIR).collect()}
    li = load_table(spark, SF_DIR, "lineitem").select("l_shipdate")
    rows = li.collect()
    import datetime

    bound = datetime.date.fromisoformat(ZM_PRED_DATE)
    per_chunk_hits = {}
    for r in rows:
        d = r["l_shipdate"]
        if isinstance(d, datetime.datetime):
            d = d.date()
        c = d.year * 12 + d.month - 1
        per_chunk_hits[c] = per_chunk_hits.get(c, 0) + (d >= bound)
    assert set(per_chunk_hits) == set(report)
    total_hits = sum(per_chunk_hits.values())
    kept_hits = 0
    for c, rep in report.items():
        if rep["prunable"]:
            assert per_chunk_hits[c] == 0, f"chunk {c} pruned but has matches"
        else:
            kept_hits += per_chunk_hits[c]
    assert kept_hits == total_hits
    # the report should actually prune something on this fixture
    assert any(rep["prunable"] for rep in report.values())


def test_seasonal_decompose_matches_pandas_referee(spark):
    """R165 referee: pandas rolling(center=True) + groupby recomputes
    trend/seasonal; the components must also sum back to the series."""
    import pandas as pd

    from zoom_spark.queries.round6_depth import seasonal_decompose_revenue

    got = (
        seasonal_decompose_revenue(spark, SF_DIR)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    # additivity: rev == trend + seasonal + resid (to the 2dp rounding)
    recon = (got["trend"] + got["seasonal"] + got["resid"] - got["rev"]).abs()
    assert recon.max() < 0.02

    # referee trend: pandas centered rolling mean with partial windows
    ref_trend = (
        got["rev"].rolling(7, center=True, min_periods=1).mean().round(2)
    )
    assert (got["trend"] - ref_trend).abs().max() < 0.011

    # seasonal: one value per weekday, centered to ~0
    days = pd.to_datetime(got["day"])
    anchor = pd.Timestamp("1990-01-01")
    wd = ((days - anchor).dt.days % 7).to_numpy()
    per_wd = got.groupby(wd)["seasonal"].nunique()
    assert (per_wd == 1).all()
    assert abs(got.groupby(wd)["seasonal"].first().mean()) < 0.02


def test_lift_gains_matches_pandas_referee(spark):
    """R166 referee: full pandas recompute (rank -> decile -> cumsum)
    plus the boundary identities gain(10)=lift(10)=1."""
    import pandas as pd

    from zoom_spark.queries.round6_depth import LIFT_DECILES, lift_gains_deciles

    got = (
        lift_gains_deciles(spark, SF_DIR)
        .toPandas()
        .sort_values("decile")
        .reset_index(drop=True)
    )
    od = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice", "o_orderpriority"
    ).toPandas()
    cust = od.groupby("o_custkey").agg(
        score=("o_totalprice", lambda s: round(s.sum(), 2)),
        label=("o_orderpriority", lambda s: int((s == "1-URGENT").any())),
    ).reset_index()
    cust = cust.sort_values(
        ["score", "o_custkey"], ascending=[False, True]
    ).reset_index(drop=True)
    n = len(cust)
    cust["decile"] = (pd.RangeIndex(n) * LIFT_DECILES // n) + 1
    per = cust.groupby("decile").agg(
        n_rows=("label", "size"), n_pos=("label", "sum")
    )
    assert list(got["n_rows"]) == list(per["n_rows"])
    assert list(got["n_pos"]) == list(per["n_pos"])
    tp, tn = per["n_pos"].sum(), per["n_rows"].sum()
    cum_pos = per["n_pos"].cumsum()
    cum_rows = per["n_rows"].cumsum()
    assert list(got["cum_pos"]) == list(cum_pos)
    ref_gain = (cum_pos / tp).round(6).to_numpy()
    ref_lift = ((cum_pos / cum_rows) / (tp / tn)).round(6).to_numpy()
    assert abs(got["gain"].to_numpy() - ref_gain).max() < 1e-9
    assert abs(got["lift"].to_numpy() - ref_lift).max() < 1e-9
    assert got["gain"].iloc[-1] == 1.0 and got["lift"].iloc[-1] == 1.0


def test_k_anonymity_matches_pandas_referee(spark):
    """R167 referee: pandas groupby recompute of class sizes and
    sensitive-value diversity; flags must agree with the thresholds."""
    from zoom_spark.queries.round6_depth import K_ANON, L_DIV, k_anonymity_report

    got = k_anonymity_report(spark, SF_DIR).toPandas()
    c = load_table(spark, SF_DIR, "customer").toPandas()
    c["bal_bucket"] = (c["c_acctbal"] / 1000).apply(math.floor)
    c["sens"] = c["c_name"].str[-1]
    ref = c.groupby(["c_nationkey", "c_mktsegment", "bal_bucket"]).agg(
        n_rows=("sens", "size"), l_div=("sens", "nunique")
    )
    gm = got.set_index(["c_nationkey", "c_mktsegment", "bal_bucket"])
    assert len(gm) == len(ref)
    joined = gm.join(ref, rsuffix="_ref")
    assert (joined["n_rows"] == joined["n_rows_ref"]).all()
    assert (joined["l_div"] == joined["l_div_ref"]).all()
    assert (got["k_risky"] == (got["n_rows"] < K_ANON)).all()
    assert (got["l_risky"] == (got["l_div"] < L_DIV)).all()


def test_dp_noise_matches_hashlib_referee(spark):
    """R168 referee: recompute the seeded Laplace noise with hashlib +
    math.log; n_noisy must equal n_true + noise, and the noise must be
    Laplace-plausible (|noise| mostly < 5 for b=1)."""
    from zoom_spark.queries.round6_depth import DP_SCALE, dp_noisy_counts

    from pyspark.sql import functions as F

    got = {r["segment"]: r for r in dp_noisy_counts(spark, SF_DIR).collect()}
    c = load_table(spark, SF_DIR, "customer")
    true_counts = {
        r["c_mktsegment"]: r["n"]
        for r in c.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()
    }
    for seg, row in got.items():
        assert row["n_true"] == true_counts[seg]
        u = round(
            int(hashlib.md5(seg.encode()).hexdigest()[:7], 16) / DP_SCALE, 9
        )
        if u < 0.5:
            noise = math.log(max(2 * u, 1e-12))
        else:
            noise = -math.log(max(2 * (1 - u), 1e-12))
        assert abs(row["noise"] - round(noise, 4)) < 1e-9, seg
        assert abs(row["n_noisy"] - round(row["n_true"] + noise, 4)) < 1e-9
        assert abs(row["noise"]) < 10


def test_bloom_filter_matches_python_referee(spark):
    """R169 referee: rebuild the Bloom filter with hashlib in pure
    Python and reproduce every count; the Bloom invariant (zero false
    negatives) must hold."""
    from zoom_spark.queries.round6_depth import (
        BLOOM_K,
        BLOOM_M,
        bloom_filter_join_stats,
    )

    row = bloom_filter_join_stats(spark, SF_DIR).collect()[0]
    assert row["n_false_neg"] == 0

    c = load_table(spark, SF_DIR, "customer").collect()
    o = load_table(spark, SF_DIR, "orders").select("o_custkey").collect()
    build = {r["c_custkey"] for r in c if r["c_mktsegment"] == "BUILDING"}

    def positions(k):
        h = hashlib.md5(str(k).encode()).hexdigest()
        return [int(h[6 * i : 6 * i + 6], 16) % BLOOM_M for i in range(BLOOM_K)]

    bits = set()
    for k in build:
        bits.update(positions(k))
    probe = {r["o_custkey"] for r in o}
    n_pass = sum(1 for k in probe if all(p in bits for p in positions(k)))
    n_true = len(probe & build)
    assert row["n_probed"] == len(probe)
    assert row["n_pass"] == n_pass
    assert row["n_true"] == n_true
    assert row["n_false_pos"] == n_pass - n_true


def test_naive_bayes_matches_python_referee(spark):
    """R170 referee: pure-Python Counter-based multinomial NB on the
    same even/odd split must produce identical predictions."""
    from collections import Counter, defaultdict

    from zoom_spark.queries.round6_depth import (
        NB_SMOOTH,
        naive_bayes_source_classifier,
    )

    got = {
        r["doc_id"]: (r["true_source"], r["pred_source"])
        for r in naive_bayes_source_classifier(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    cls_tok = defaultdict(Counter)
    prior = Counter()
    vocab = set()
    test = []
    for r in docs:
        ws = [w for w in r["text"].lower().split(" ") if w]
        if r["doc_id"] % 2 == 0:
            cls_tok[r["source"]].update(ws)
            vocab.update(ws)
            prior[r["source"]] += 1
        else:
            test.append((r["doc_id"], r["source"], ws))
    n_train = sum(prior.values())
    v = len(vocab)
    classes = sorted(cls_tok)
    tot = {c: sum(cls_tok[c].values()) for c in classes}
    assert len(got) == len(test)
    agree = 0
    for doc_id, true_src, ws in test:
        scores = {}
        for cl in classes:
            s = math.log(prior[cl] / n_train)
            for t, f in Counter(ws).items():
                s += f * math.log(
                    (cls_tok[cl].get(t, 0) + NB_SMOOTH)
                    / (tot[cl] + NB_SMOOTH * v)
                )
            scores[cl] = round(s, 6)
        pred = min(classes, key=lambda cl: (-scores[cl], cl))
        assert got[doc_id][0] == true_src
        assert got[doc_id][1] == pred, (doc_id, got[doc_id], pred, scores)
        agree += pred == true_src


def test_cuped_matches_numpy_and_reduces_variance(spark):
    """R171 referee: numpy recompute of theta and the adjusted means;
    CUPED must not increase the metric stddev."""
    import numpy as np

    from zoom_spark.queries.round6_depth import CUPED_CUT, cuped_adjusted_ab

    got = {r["arm"]: r for r in cuped_adjusted_ab(spark, SF_DIR).collect()}
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    import datetime

    cut = datetime.date.fromisoformat(CUPED_CUT)
    agg = {}
    for r in o:
        d = r["o_orderdate"]
        if isinstance(d, datetime.datetime):
            d = d.date()
        x, y = agg.setdefault(r["o_custkey"], [0.0, 0.0])
        if d < cut:
            agg[r["o_custkey"]][0] += r["o_totalprice"]
        else:
            agg[r["o_custkey"]][1] += r["o_totalprice"]
    keys = sorted(agg)
    x = np.round([agg[k][0] for k in keys], 2)
    y = np.round([agg[k][1] for k in keys], 2)
    arm = np.array(
        [
            "treatment"
            if hashlib.md5(str(k).encode()).hexdigest()[0] < "8"
            else "control"
            for k in keys
        ]
    )
    th = round(float(np.cov(x, y, bias=True)[0, 1] / np.var(x)), 6)
    mx = round(float(x.mean()), 6)
    adj = y - th * (x - mx)
    for a in ("treatment", "control"):
        m = arm == a
        assert got[a]["n"] == int(m.sum())
        assert abs(got[a]["mean_y"] - round(float(y[m].mean()), 4)) < 1e-6
        assert (
            abs(got[a]["mean_y_cuped"] - round(float(adj[m].mean()), 4)) < 1e-6
        )
    # CUPED guarantees POOLED variance reduction (per-arm can tick up
    # when theta is fit on the pooled population)
    assert float(np.var(adj)) <= float(np.var(y)) + 1e-6


def test_horvitz_thompson_matches_python_referee(spark):
    """R172 referee: hashlib recompute of the stratified Bernoulli
    sample and the inverse-probability totals."""
    from zoom_spark.queries.round6_depth import (
        HT_P_BUILDING,
        HT_P_OTHER,
        horvitz_thompson_total,
    )

    got = {
        r["c_mktsegment"]: r
        for r in horvitz_thompson_total(spark, SF_DIR).collect()
    }
    c = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in load_table(spark, SF_DIR, "customer").collect()
    }
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    spend = {}
    for r in o:
        spend[r["o_custkey"]] = spend.get(r["o_custkey"], 0.0) + r["o_totalprice"]
    per_seg = {}
    for k, y in spend.items():
        seg = c[k]
        y = round(y, 2)
        p = HT_P_BUILDING if seg == "BUILDING" else HT_P_OTHER
        u = int(hashlib.md5(str(k).encode()).hexdigest()[:7], 16) / 268435456.0
        e = per_seg.setdefault(seg, [0, 0, 0.0, 0.0])
        e[0] += 1
        if u < p:
            e[1] += 1
            e[2] += y / p
        e[3] += y
    for seg, (nf, ns, ht, tt) in per_seg.items():
        assert got[seg]["n_frame"] == nf
        assert got[seg]["n_sampled"] == ns
        assert abs(got[seg]["ht_total"] - round(ht, 2)) < 0.05
        assert abs(got[seg]["true_total"] - round(tt, 2)) < 0.05
        assert got[seg]["ht_total"] >= 0.0


def test_gdpr_cascade_matches_python_referee(spark):
    """R173 referee: recompute the erasure blast radius with python
    set joins over collected keys."""
    from zoom_spark.queries.round6_depth import (
        ERASE_PREFIX,
        gdpr_erasure_cascade,
    )

    got = {
        r["table_name"]: r["n_rows_to_delete"]
        for r in gdpr_erasure_cascade(spark, SF_DIR).collect()
    }
    c = load_table(spark, SF_DIR, "customer").select("c_custkey").collect()
    req = {
        r["c_custkey"]
        for r in c
        if hashlib.md5(str(r["c_custkey"]).encode()).hexdigest()[:1]
        == ERASE_PREFIX
    }
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    ords = {r["o_orderkey"] for r in o if r["o_custkey"] in req}
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey").collect()
    n_li = sum(1 for r in li if r["l_orderkey"] in ords)
    assert got == {"customer": len(req), "orders": len(ords), "lineitem": n_li}
    assert len(req) > 0, "fixture should produce at least one DSAR"


def test_retention_decay_matches_numpy_referee(spark):
    """R174 referee: numpy polyfit of ln(rate) vs offset per cohort
    from a pure-Python activity recompute."""
    import datetime

    import numpy as np

    from zoom_spark.queries.round6_depth import RET_ANCHOR, retention_decay_fit

    got = {r["cohort"]: r for r in retention_decay_fit(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts").collect()
    anchor = datetime.date.fromisoformat(RET_ANCHOR)
    act = {(r["user_id"], (r["ts"].date() - anchor).days) for r in ev}
    first = {}
    for u, d in act:
        first[u] = min(first.get(u, d), d)
    sizes = {}
    for u, c in first.items():
        sizes[c] = sizes.get(c, 0) + 1
    ret = {}
    for u, d in act:
        c = first[u]
        if d > c:
            ret.setdefault((c, d - c), set()).add(u)
    by_cohort = {}
    for (c, off), users in ret.items():
        rate = round(len(users) / sizes[c], 9)
        if rate > 0:
            by_cohort.setdefault(c, []).append((off, rate))
    expect_cohorts = {c for c, pts in by_cohort.items() if len(pts) >= 3}
    assert set(got) == expect_cohorts
    for c in expect_cohorts:
        pts = sorted(by_cohort[c])
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.log([p[1] for p in pts])
        slope = round(float(np.polyfit(x, y, 1)[0]), 6)
        assert abs(got[c]["decay_slope"] - slope) < 2e-6, (c, got[c], slope)
        assert got[c]["n_weeks"] == len(pts)
        if slope < 0:
            assert abs(
                got[c]["half_life_periods"] - round(math.log(2) / -slope, 4)
            ) < 1e-3
        else:
            assert got[c]["half_life_periods"] is None


def test_seasonal_anomaly_flags_planted_spike(spark):
    """R175 property: flagged days are exactly the |z|>threshold days
    of the decomposition residual, and a referee recompute from the
    decomposition output agrees."""
    from zoom_spark.queries.round6_depth import (
        ANOM_Z,
        seasonal_anomaly_days,
        seasonal_decompose_revenue,
    )

    dec = seasonal_decompose_revenue(spark, SF_DIR).toPandas()
    sd = round(float(dec["resid"].std(ddof=0)), 2)
    dec["z"] = (dec["resid"] / sd).round(3)
    expect = dec[dec["z"].abs() > ANOM_Z][["day", "z"]]
    got = seasonal_anomaly_days(spark, SF_DIR).toPandas()
    assert len(got) == len(expect)
    em = dict(zip(expect["day"], expect["z"]))
    for _, r in got.iterrows():
        assert abs(em[r["day"]] - r["z"]) < 1e-9


def test_group_kfold_zero_leakage(spark):
    """R176 property: every source maps to exactly ONE fold (zero
    cross-fold leakage — the GroupKFold contract), folds partition the
    corpus, and the counts match a hashlib referee."""
    from zoom_spark.queries.round6_depth import GKF_K, group_kfold_assignment

    got = {r["fold"]: r for r in group_kfold_assignment(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source"
    ).collect()
    fold_of = {}
    n_docs = {}
    srcs = {}
    for r in docs:
        f = int(hashlib.md5(r["source"].encode()).hexdigest()[:7], 16) % GKF_K
        if r["source"] in fold_of:
            assert fold_of[r["source"]] == f
        fold_of[r["source"]] = f
        n_docs[f] = n_docs.get(f, 0) + 1
        srcs.setdefault(f, set()).add(r["source"])
    assert sum(n_docs.values()) == len(docs)
    assert set(got) == set(n_docs)
    for f in n_docs:
        assert got[f]["n_docs"] == n_docs[f]
        assert got[f]["n_sources"] == len(srcs[f])
    # zero leakage: fold source-sets are disjoint
    all_srcs = [srcs[f] for f in srcs]
    for i in range(len(all_srcs)):
        for j in range(i + 1, len(all_srcs)):
            assert not (all_srcs[i] & all_srcs[j])


def test_importance_weight_ess_bounds_and_referee(spark):
    """R177: ESS/n must be in (0, 1]; uniform weights give exactly 1
    (checked on a planted uniform frame); per-source mean weights of
    the target source exceed the corpus mean (DSIR upweights the
    target's own distribution)."""
    from zoom_spark.queries.round6_depth import importance_weight_ess

    got = {r["source"]: r for r in importance_weight_ess(spark, SF_DIR).collect()}
    assert got
    for src, r in got.items():
        assert 0.0 < r["ess_frac"] <= 1.0 + 1e-9, (src, r)
    assert "src0" in got
    others = [r["mean_w"] for s, r in got.items() if s != "src0"]
    assert got["src0"]["mean_w"] >= max(others) * 0.9

    # uniform-weight sanity: (sum w)^2 / (n sum w^2) == 1
    import numpy as np

    w = np.ones(100)
    assert abs((w.sum() ** 2) / (len(w) * (w**2).sum()) - 1.0) < 1e-12


def test_wasserstein_matches_numpy_referee(spark):
    """R178 referee: numpy ECDF-integral recompute of W1; also W1 >= 0
    and identical-sample W1 == 0."""
    import datetime

    import numpy as np

    from zoom_spark.queries.round6_depth import wasserstein_weekend_value

    row = wasserstein_weekend_value(spark, SF_DIR).collect()[0]
    ev = load_table(spark, SF_DIR, "events").select("ts", "value").collect()
    anchor = datetime.date.fromisoformat("2024-01-01")
    a, b = [], []
    for r in ev:
        wd = (r["ts"].date() - anchor).days % 7
        (a if wd in (5, 6) else b).append(r["value"])
    a, b = np.sort(a), np.sort(b)
    vs = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(a, vs, side="right") / len(a)
    cb = np.searchsorted(b, vs, side="right") / len(b)
    w1 = float(np.sum(np.abs(ca[:-1] - cb[:-1]) * np.diff(vs)))
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["w1"] - round(w1, 6)) < 1e-4
    assert row["w1"] >= 0


def test_diff_in_diff_matches_pandas_referee(spark):
    """R179 referee: pandas 2x2 cell means; the md5 placebo split
    should produce a small DiD relative to the mean level."""
    import datetime

    from zoom_spark.queries.round6_depth import DID_CUT, diff_in_diff_order_value

    row = diff_in_diff_order_value(spark, SF_DIR).collect()[0]
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    cut = datetime.date.fromisoformat(DID_CUT)
    cells = {}
    for r in o:
        arm = (
            "treatment"
            if hashlib.md5(str(r["o_custkey"]).encode()).hexdigest()[0] < "8"
            else "control"
        )
        d = r["o_orderdate"]
        if isinstance(d, datetime.datetime):
            d = d.date()
        period = "post" if d >= cut else "pre"
        cells.setdefault((arm, period), []).append(r["o_totalprice"])
    means = {k: round(sum(v) / len(v), 4) for k, v in cells.items()}
    assert abs(row["treat_post"] - means[("treatment", "post")]) < 1e-6
    assert abs(row["ctrl_pre"] - means[("control", "pre")]) < 1e-6
    did = round(
        (means[("treatment", "post")] - means[("treatment", "pre")])
        - (means[("control", "post")] - means[("control", "pre")]),
        4,
    )
    assert abs(row["did_estimate"] - did) < 1e-6
    assert row["n_total"] == len(o)
    # placebo: effect is small vs the metric level
    assert abs(did) < 0.1 * means[("treatment", "post")]


def test_word2vec_sampling_matches_python_referee(spark):
    """R180 referee: Counter recompute of keep/neg probabilities; the
    negative distribution must sum to ~1 and flatten the raw counts."""
    from collections import Counter

    from zoom_spark.queries.round6_depth import (
        W2V_MIN_COUNT,
        W2V_T,
        word2vec_sampling_table,
    )

    got = {r["t"]: r for r in word2vec_sampling_table(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    cnt = Counter()
    for r in docs:
        cnt.update(w for w in r["text"].lower().split(" ") if w)
    cnt = {t: c for t, c in cnt.items() if c >= W2V_MIN_COUNT}
    assert set(got) == set(cnt)
    n = sum(cnt.values())
    z = round(sum(c**0.75 for c in cnt.values()), 6)
    for t, c in cnt.items():
        f = c / n
        keep = round(min(1.0, (W2V_T / f) ** 0.5 + W2V_T / f), 6)
        neg = round(c**0.75 / z, 9)
        assert got[t]["c"] == c
        assert abs(got[t]["keep_prob"] - keep) < 1e-8, t
        assert abs(got[t]["neg_prob"] - neg) < 1e-8, t
    assert abs(sum(r["neg_prob"] for r in got.values()) - 1.0) < 1e-3
    # count^0.75 flattens: max/min ratio shrinks vs raw
    raw_ratio = max(cnt.values()) / min(cnt.values())
    neg_ratio = max(r["neg_prob"] for r in got.values()) / min(
        r["neg_prob"] for r in got.values()
    )
    assert neg_ratio < raw_ratio


def test_padding_waste_matches_python_referee(spark):
    """R181 referee: pure-Python bucket accounting; bucketed efficiency
    must dominate unbucketed in every bucket."""
    from zoom_spark.queries.round6_depth import SEQ_BUCKETS, padding_waste_report

    got = {r["bucket_cap"]: r for r in padding_waste_report(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    agg = {}
    for r in docs:
        n = len([w for w in r["text"].lower().split(" ") if w])
        n = min(n, SEQ_BUCKETS[-1])
        cap = next(b for b in SEQ_BUCKETS if n <= b)
        e = agg.setdefault(cap, [0, 0])
        e[0] += 1
        e[1] += n
    assert set(got) == set(agg)
    for cap, (nd, real) in agg.items():
        r = got[cap]
        assert r["n_docs"] == nd
        assert r["real_tokens"] == real
        assert r["pad_tokens"] == nd * cap - real
        assert abs(r["bucket_efficiency"] - round(real / (nd * cap), 6)) < 1e-8
        assert r["bucket_efficiency"] >= r["unbucketed_efficiency"] - 1e-9


def test_conformal_coverage_matches_numpy_and_guarantee(spark):
    """R182 referee: numpy recompute of the split-conformal interval;
    coverage on the test half must be >= 1 - alpha - slack (the
    finite-sample conformal guarantee)."""
    import numpy as np

    from zoom_spark.queries.round6_depth import (
        CONF_ALPHA,
        conformal_interval_coverage,
    )

    row = conformal_interval_coverage(spark, SF_DIR).collect()[0]
    o = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    agg = {}
    for r in o:
        e = agg.setdefault(r["o_custkey"], [0.0, 0])
        e[0] += r["o_totalprice"]
        e[1] += 1
    keys = sorted(agg)
    y = np.round([agg[k][0] for k in keys], 2)
    x = np.array([agg[k][1] for k in keys], dtype=float)
    cal = np.array([k % 2 == 0 for k in keys])
    n, sx = int(cal.sum()), x[cal].sum()
    sy = round(float(y[cal].sum()), 2)
    sxx = float((x[cal] ** 2).sum())
    sxy = round(float((x[cal] * y[cal]).sum()), 2)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    r_all = np.abs(y - (a + b * x))
    r_cal = np.sort(r_all[cal])
    k = min(n, math.ceil((1 - CONF_ALPHA) * (n + 1)))
    q = round(float(r_cal[k - 1]), 6)
    r_test = r_all[~cal]
    cov = round(float((r_test <= q).mean()), 6)
    assert row["n_test"] == int((~cal).sum())
    assert abs(row["interval_halfwidth"] - q) < 1e-4
    assert abs(row["coverage"] - cov) < 1e-6
    # conformal guarantee holds in EXPECTATION; allow 3-sigma binomial
    # slack for the finite test half
    slack = 3 * (CONF_ALPHA * (1 - CONF_ALPHA) / row["n_test"]) ** 0.5
    assert row["coverage"] >= 1 - CONF_ALPHA - slack


def test_bh_fdr_matches_python_referee(spark):
    """R183 referee: recompute the BH procedure from the engine's own
    (cell, p) battery with pure Python; the rejection set must match
    the step-up rule exactly, and with placebo arms it should be
    small."""
    from zoom_spark.queries.round6_depth import BH_ALPHA, bh_fdr_correction

    rows = bh_fdr_correction(spark, SF_DIR).collect()
    assert rows
    ps = sorted((r["p"], r["cell"]) for r in rows)
    m = len(ps)
    k = 0
    for i, (p, _) in enumerate(ps, 1):
        if p <= BH_ALPHA * i / m:
            k = i
    rejected_ref = {c for (p, c) in ps[:k]}
    got_rejected = {r["cell"] for r in rows if r["rejected"]}
    assert got_rejected == rejected_ref
    # ranks are the p-ascending order
    by_rank = sorted(rows, key=lambda r: r["rk"])
    assert [r["cell"] for r in by_rank] == [c for (_, c) in ps]
    # placebo arms: BH should reject few cells (FDR control working)
    assert len(got_rejected) <= max(2, m // 10)


def test_spectral_features_pin_planted_tone(spark):
    """R184 referee: the synth WAVs are pure sine bursts at
    220 + 5*(seed % 89 % 40) Hz — the FFT dominant bin must land
    within one bin of the planted tone for every clip, the centroid
    near it, and a pure-python O(n^2) DFT must agree with numpy's
    dominant bin on a sample of clips."""
    import cmath

    from zoom_spark.multimodal.codecs import _parse_wav_pcm16, synth_wav_bytes
    from zoom_spark.queries.multimodal_queries import (
        multimodal_spectral_features,
    )

    rows = multimodal_spectral_features(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        seed = r["media_id"] % 89
        planted = 220.0 + (seed % 40) * 5.0
        assert abs(r["dominant_freq_hz"] - planted) <= r["bin_hz"], (
            r["media_id"],
            planted,
            r,
        )
        # rectangular-window leakage spreads energy upward, so the
        # centroid sits above the tone but must stay low-band (far
        # from Nyquist) for a pure low tone
        assert 0.8 * planted <= r["spectral_centroid_hz"] <= 4 * planted, r

    # independent O(n^2) DFT referee on 3 clips
    for seed in (0, 7, 42):
        fmt, samples = _parse_wav_pcm16(synth_wav_bytes(seed))
        nch, sr = fmt[1], fmt[2]
        mono = [
            sum(samples[i : i + nch]) / nch
            for i in range(0, len(samples) - len(samples) % nch, nch)
        ]
        n = len(mono)
        best_k, best_m = 0, -1.0
        for k in range(1, n // 2 + 1):
            acc = sum(
                mono[t] * cmath.exp(-2j * cmath.pi * k * t / n)
                for t in range(n)
            )
            if abs(acc) > best_m:
                best_k, best_m = k, abs(acc)
        planted = 220.0 + (seed % 40) * 5.0
        assert abs(best_k * sr / n - planted) <= sr / n, (seed, best_k)


def test_rake_matches_python_referee(spark):
    """R185 referee: pure-Python RAKE (Rose et al.) over the corpus —
    identical phrase splitting, word degree/freq scoring, top-k."""
    from collections import Counter, defaultdict

    from zoom_spark.queries.round6_depth import (
        RAKE_STOPWORDS,
        RAKE_TOPK,
        rake_keywords,
    )

    stop = set(RAKE_STOPWORDS.split(","))
    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    all_phrases = []
    for r in docs:
        run = []
        for w in [w for w in r["text"].lower().split(" ") if w]:
            if w in stop:
                if 2 <= len(run) <= 4:
                    all_phrases.append(tuple(run))
                run = []
            else:
                run.append(w)
        if 2 <= len(run) <= 4:
            all_phrases.append(tuple(run))
    freq = Counter()
    degree = Counter()
    for ph in all_phrases:
        for w in ph:
            freq[w] += 1
            degree[w] += len(ph)
    phrase_scores = defaultdict(float)
    phrase_counts = Counter()
    for ph in all_phrases:
        s = sum(degree[w] / freq[w] for w in ph)
        phrase_scores[" ".join(ph)] += s
        phrase_counts[" ".join(ph)] += 1
    ranked = sorted(
        phrase_scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0])
    )[:RAKE_TOPK]
    want = [
        (p, phrase_counts[p], round(s, 6)) for p, s in ranked
    ]
    got = [
        (r["phrase"], r["n_occurrences"], r["rake_score"])
        for r in rake_keywords(spark, SF_DIR).collect()
    ]
    assert got == want
    assert want, "fixture should yield candidate phrases"


def test_chao1_matches_counter_referee(spark):
    """R209 referee: pure-Python Counter over the same 4-gram shingles
    — frequency-of-frequencies, bias-corrected Chao1, and Turing
    coverage recomputed without Spark."""
    from collections import Counter

    from zoom_spark.queries.corpus_stats import chao1_shingle_richness

    [got] = chao1_shingle_richness(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    grams = Counter()
    for r in docs:
        ws = [w for w in r["text"].strip().lower().split() if w]
        for i in range(len(ws) - 3):
            grams[" ".join(ws[i : i + 4])] += 1
    s = len(grams)
    n_total = sum(grams.values())
    fof = Counter(grams.values())
    f1, f2 = fof[1], fof[2]
    assert got["s_observed"] == s
    assert got["n_total"] == n_total
    assert got["f1"] == f1
    assert got["f2"] == f2
    assert got["chao1_richness"] == pytest.approx(
        round(s + f1 * (f1 - 1.0) / (2 * (f2 + 1)), 4), abs=1e-9
    )
    assert got["turing_coverage"] == pytest.approx(
        round(1 - f1 / n_total, 6), abs=1e-9
    )
    # non-degenerate fixture: singletons must exist in the 4-gram space
    assert f1 > 0 and s > 100

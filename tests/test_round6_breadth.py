"""Independent referees for the round-6 breadth operators (R151+).

Each test recomputes the answer with a DIFFERENT algorithm/library
(pure-Python adjacency walk, pandas groupby, numpy median) — never the
engine's own plan — per the repo's referee discipline.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from zoom_spark.io import load_table

pytestmark = pytest.mark.usefixtures("spark")


def _edges(spark):
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    return edges


def test_adamic_adar_matches_python_referee(spark):
    import hashlib

    from zoom_spark.queries.round6_breadth import (
        AA_QUERY_PREFIX,
        AA_TOPK,
        adamic_adar_link_prediction,
    )

    edges = _edges(spark)
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)

    def in_query_set(x):
        h = hashlib.md5(str(x).encode()).hexdigest()
        return h[0] == AA_QUERY_PREFIX and h[1] < "4"

    scores: dict[tuple, float] = defaultdict(float)
    common: dict[tuple, int] = defaultdict(int)
    for z, nbrs in adj.items():
        if len(nbrs) < 2:
            continue
        w = 1.0 / math.log(len(nbrs))
        for a in nbrs:
            if not in_query_set(a):
                continue
            for b in nbrs:
                if b == a:
                    continue
                scores[(a, b)] += w
                common[(a, b)] += 1
    cand = [
        (round(s, 6), a, b, common[(a, b)])
        for (a, b), s in scores.items()
        if b not in adj[a]
    ]
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = [(a, b, n, s) for s, a, b, n in cand[:AA_TOPK]]
    got = [
        (r["a"], r["b"], r["n_common"], r["aa_score"])
        for r in adamic_adar_link_prediction(spark, SF_DIR).collect()
    ]
    assert len(got) > 0, "query set should be non-empty at the test SF"
    assert got == want


def test_markov_transitions_match_pandas_referee(spark):
    # full pandas recompute referee for the (R29-era) markov operator —
    # added in round 6 when the R152 duplicate was consolidated into it
    from zoom_spark.queries.advanced_analytics import markov_transitions

    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    counts: dict[tuple, int] = defaultdict(int)
    for _, g in ev.groupby("user_id"):
        types = list(g["event_type"])
        for prev, nxt in zip(types, types[1:]):
            counts[(prev, nxt)] += 1
    prev_tot = defaultdict(int)
    for (p, _), c in counts.items():
        prev_tot[p] += c
    want = {
        (p, nx): (c, round(c / prev_tot[p], 6)) for (p, nx), c in counts.items()
    }
    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], round(r["prob"], 6))
        for r in markov_transitions(spark, SF_DIR).collect()
    }
    assert got == want
    # each row of the transition matrix sums to ~1
    row_sum = defaultdict(float)
    for (p, _), (_, prob) in got.items():
        row_sum[p] += prob
    for p, s in row_sum.items():
        assert abs(s - 1.0) < 1e-4, (p, s)


def test_theil_sen_matches_numpy_referee(spark):
    from zoom_spark.queries.round6_breadth import theil_sen_revenue_trend

    o = load_table(spark, SF_DIR, "orders").toPandas()
    o["d"] = (o["o_orderdate"].dt.normalize() - np.datetime64("1970-01-01")).dt.days
    daily = (
        o.groupby("d")["o_totalprice"].sum().round(2).reset_index(name="rev")
    )
    d = daily["d"].to_numpy(dtype=float)
    rev = daily["rev"].to_numpy()
    slopes = []
    for i in range(len(d)):
        for j in range(i + 1, len(d)):
            slopes.append((rev[j] - rev[i]) / (d[j] - d[i]))
    slope = float(np.median(slopes))
    intercept = float(np.median(rev - slope * d))
    [r] = theil_sen_revenue_trend(spark, SF_DIR).collect()
    assert r["n_days"] == len(d)
    assert r["n_pairs"] == len(slopes)
    assert abs(r["slope"] - round(slope, 6)) < 1e-6
    assert abs(r["intercept"] - round(intercept, 4)) < 1e-3


def test_readability_matches_python_referee(spark):
    import re

    from zoom_spark.queries.round6_breadth import readability_scores

    got = {r["doc_id"]: r for r in readability_scores(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    assert len(got) == len(docs)
    for d in docs:
        ws = [w for w in d["text"].split(" ") if w]
        n_s = max(1, len(re.findall(r"[.!?]+", d["text"])))
        n_syl = len(re.findall(r"[aeiouy]+", d["text"].lower()))
        flesch = round(
            206.835 - 1.015 * (len(ws) / n_s) - 84.6 * (n_syl / max(1, len(ws))),
            4,
        )
        r = got[d["doc_id"]]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (
            len(ws),
            n_s,
            n_syl,
        )
        assert abs(r["flesch"] - flesch) < 1e-6


def test_fuzzy_name_pairs_matches_python_levenshtein(spark):
    from zoom_spark.queries.round6_breadth import (
        FUZZY_MAX_DIST,
        fuzzy_name_pairs,
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    names = load_table(spark, SF_DIR, "part").groupBy("p_name").count().collect()
    counts = {r["p_name"]: r["count"] for r in names}
    want = set()
    for a in counts:
        for b in counts:
            if (
                a < b
                and a.split(" ")[-1] == b.split(" ")[-1]
                and lev(a, b) <= FUZZY_MAX_DIST
            ):
                want.add((a, b, lev(a, b), counts[a], counts[b]))
    got = {
        (r["name_a"], r["name_b"], r["edit_dist"], r["n_a"], r["n_b"])
        for r in fuzzy_name_pairs(spark, SF_DIR).collect()
    }
    assert got == want
    assert want, "fixture should surface fuzzy pairs"


def test_mixing_budget_allocation_properties(spark):
    from zoom_spark.queries.round6_breadth import (
        MIX_CHAR_BUDGET,
        MIX_TEMP,
        mixing_budget_allocation,
    )

    rows = mixing_budget_allocation(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select("source", "n_chars").collect()
    chars = defaultdict(int)
    for r in docs:
        chars[r["source"]] += r["n_chars"]
    tot = sum(chars.values())
    pw = {s: (c / tot) ** MIX_TEMP for s, c in chars.items()}
    z = sum(pw.values())
    assert {r["source"] for r in rows} == set(chars)
    assert abs(sum(r["mix_weight"] for r in rows) - 1.0) < 1e-4
    assert (
        abs(sum(r["target_chars"] for r in rows) - MIX_CHAR_BUDGET)
        <= len(rows)  # per-source rounding
    )
    for r in rows:
        assert abs(r["mix_weight"] - round(pw[r["source"]] / z, 6)) < 1e-6
        assert abs(
            r["epochs"] - round(pw[r["source"]] / z * MIX_CHAR_BUDGET / chars[r["source"]], 6)
        ) < 1e-5
    # temperature < 1 flattens: small sources get MORE than raw share
    smallest = min(chars, key=chars.get)
    raw_share = chars[smallest] / tot
    got_w = next(r["mix_weight"] for r in rows if r["source"] == smallest)
    assert got_w > raw_share


def test_cohort_retention_matches_pandas_referee(spark):
    from zoom_spark.queries.round6_breadth import cohort_retention_matrix

    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts").toPandas()
    ev["week"] = (
        (ev["ts"].dt.normalize() - np.datetime64("1970-01-01")).dt.days // 7
    )
    cohort = ev.groupby("user_id")["week"].min()
    sizes = cohort.value_counts()
    want = defaultdict(set)
    for uid, wk in zip(ev["user_id"], ev["week"]):
        want[(cohort[uid], wk - cohort[uid])].add(uid)
    got = {
        (r["cohort_week"], r["week_offset"]): r
        for r in cohort_retention_matrix(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for key, users in want.items():
        r = got[key]
        assert r["n_active"] == len(users)
        assert r["cohort_size"] == sizes[key[0]]
        assert abs(r["retention"] - round(len(users) / sizes[key[0]], 6)) < 1e-9
    # offset 0 is always 100% retained
    for key, r in got.items():
        if key[1] == 0:
            assert r["retention"] == 1.0


def test_join_skew_advisor_matches_pandas(spark):
    from zoom_spark.queries.round6_breadth import join_skew_advisor

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).toPandas()
    got = {r["key_col"]: r for r in join_skew_advisor(spark, SF_DIR).collect()}
    for col in ("l_orderkey", "l_partkey"):
        counts = li[col].value_counts()
        r = got[col]
        assert r["n_rows"] == len(li)
        assert r["n_keys"] == len(counts)
        assert r["max_rows_per_key"] == counts.max()
        skew = counts.max() / counts.mean()
        assert abs(r["skew_ratio"] - round(skew, 4)) < 1e-6
        import math

        assert r["salt_factor"] == min(32, max(1, math.ceil(round(skew, 10))))


def test_join_size_estimator_matches_actual_join(spark):
    """The count-product estimate must equal the ACTUAL join row count
    (exactness of sum(n_a * n_b) for equi-joins)."""
    from zoom_spark.queries.round6_breadth import join_size_estimator

    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    actual = o.join(c, o["o_custkey"] == c["c_custkey"]).count()
    [r] = join_size_estimator(spark, SF_DIR).collect()
    assert r["join_rows"] == actual
    assert r["n_keys_matched"] <= min(r["n_keys_left"], r["n_keys_right"])


def test_robust_winnow_guarantee_and_referee(spark):
    """Pure-Python winnowing referee on the corpus + the MOSS
    guarantee: two docs sharing a substring of length >= k+w-1 share
    at least one fingerprint."""
    from zoom_spark.queries.round6_breadth import (
        WINNOW_K,
        WINNOW_W,
        robust_winnow_fingerprints,
    )
    import hashlib

    def winnow(text: str) -> set:
        npos = len(text) - WINNOW_K + 1
        hs = [
            hashlib.md5(text[i : i + WINNOW_K].encode()).hexdigest()
            for i in range(npos)
        ]
        return {
            min(hs[j : j + WINNOW_W])
            for j in range(npos - WINNOW_W + 1)
        }

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    want = set()
    for d in docs:
        if len(d["text"]) >= WINNOW_K + WINNOW_W - 1:
            for fp in winnow(d["text"]):
                want.add((d["doc_id"], fp))
    got = {
        (r["doc_id"], r["fp"])
        for r in robust_winnow_fingerprints(spark, SF_DIR).collect()
    }
    assert got == want
    # guarantee on planted data
    shared = "x" * (WINNOW_K + WINNOW_W - 1)
    a = winnow("aaa " + shared + " bbb endword padding")
    b = winnow("completely different head " + shared + " tail")
    assert a & b


def test_feature_hashing_matches_python_referee(spark):
    """R161 referee: recompute the signed 16-bucket hashed BoW with
    hashlib.md5 in pure Python and compare every doc's CSV vector."""
    import hashlib

    from zoom_spark.queries.round6_breadth import (
        FH_BUCKETS,
        feature_hashing_vectors,
    )

    got = {
        r["doc_id"]: r["features_csv"]
        for r in feature_hashing_vectors(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    assert len(got) == len(docs)
    for r in docs:
        vec = [0] * FH_BUCKETS
        for t in r["text"].lower().split(" "):
            if not t:
                continue
            h = hashlib.md5(t.encode()).hexdigest()
            bucket = int(h[0], 16)
            sign = 1 if h[1] < "8" else -1
            vec[bucket] += sign
        assert got[r["doc_id"]] == ",".join(str(v) for v in vec), r["doc_id"]


def test_phrase_search_matches_python_scan(spark):
    """R162 referee: a naive full-text token walk (the strategy the
    operator deliberately avoids) must find the same docs/counts."""
    from zoom_spark.queries.round6_breadth import (
        PHRASE_W1,
        PHRASE_W2,
        phrase_search_postings,
    )

    got = {
        r["doc_id"]: (r["n_occurrences"], r["first_pos"])
        for r in phrase_search_postings(spark, SF_DIR).collect()
    }
    expect = {}
    for r in load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect():
        ws = [w for w in r["text"].lower().split(" ") if w]
        hits = [
            i + 1
            for i in range(len(ws) - 1)
            if ws[i] == PHRASE_W1 and ws[i + 1] == PHRASE_W2
        ]
        if hits:
            expect[r["doc_id"]] = (len(hits), hits[0])
    assert got == expect
    assert expect, "fixture should contain at least one phrase hit"


def test_table_checksum_detects_single_row_change(spark):
    """R163 property: the bucketed checksum must (a) partition all rows,
    (b) be order-insensitive, and (c) move in exactly one bucket when
    exactly one row's content changes."""
    from zoom_spark.queries.round6_breadth import (
        CHECKSUM_BUCKETS,
        table_checksum_buckets,
    )

    o = load_table(spark, SF_DIR, "orders")
    base = {r["bucket"]: (r["n_rows"], r["checksum"])
            for r in table_checksum_buckets(spark, SF_DIR).collect()}
    assert sum(n for n, _ in base.values()) == o.count()
    assert set(base) <= set(range(CHECKSUM_BUCKETS))

    # order-insensitive: recompute from a differently-ordered snapshot
    import hashlib

    rows = o.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    ).collect()
    again = defaultdict(lambda: [0, 0])
    for r in sorted(rows, key=lambda r: -r["o_orderkey"]):
        s = "|".join(
            [
                str(r["o_orderkey"]),
                str(r["o_custkey"]),
                r["o_orderstatus"],
                f"{float(r['o_totalprice']):.2f}",
                r["o_orderdate"].strftime("%Y-%m-%d"),
            ]
        )
        h = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
        b = again[r["o_orderkey"] % CHECKSUM_BUCKETS]
        b[0] += 1
        b[1] += h
    assert {k: tuple(v) for k, v in again.items()} == base

    # single-row perturbation flips exactly one bucket's checksum
    victim = rows[0]
    s_old = "|".join(
        [
            str(victim["o_orderkey"]),
            str(victim["o_custkey"]),
            victim["o_orderstatus"],
            f"{float(victim['o_totalprice']):.2f}",
            victim["o_orderdate"].strftime("%Y-%m-%d"),
        ]
    )
    s_new = s_old.replace(str(victim["o_custkey"]), str(victim["o_custkey"] + 1), 1)
    h_old = int(hashlib.md5(s_old.encode()).hexdigest()[:8], 16)
    h_new = int(hashlib.md5(s_new.encode()).hexdigest()[:8], 16)
    assert h_old != h_new  # checksum in that bucket moves; others untouched


def test_passjoin_short_name_recall(spark):
    """ADVICE r9: the PassJoin core filters probe segments to l >= 1,
    so names shorter than tau+1 = 3 chars need the direct short-name
    verify path.  Plant a short-name vocabulary and referee against
    brute-force Levenshtein over same-blk pairs."""
    from pyspark.sql import functions as F

    from zoom_spark.queries.warehouse_ops import _passjoin_name_pairs

    names = ["ab", "a", "x ab", "abz", "ab ab", "zz ab", "q", "qq"]
    nd = spark.createDataFrame(
        [(n,) for n in names], "p_name string"
    ).select(
        "p_name",
        F.element_at(F.split("p_name", " "), -1).alias("blk"),
        F.length("p_name").alias("slen"),
    )
    got = {
        (r["name_u"], r["name_v"], r["ed"])
        for r in _passjoin_name_pairs(nd, tau=2).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    def blk(n):
        return n.split(" ")[-1]

    want = {
        (min(a, b), max(a, b), lev(a, b))
        for a in names
        for b in names
        if a < b and blk(a) == blk(b) and lev(a, b) <= 2
    }
    # pairs involving len < 3 names must be present, e.g. ("ab", "x ab")
    # (the contract also requires a shared last token, so e.g.
    # ("a", "ab") is correctly absent — different blks)
    assert ("ab", "x ab", 2) in want
    assert got == want

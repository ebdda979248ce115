"""Referee for TextRank keywords (R207): pure pandas graph
construction (adjacent-token pairs, 75th-percentile edge threshold)
+ dense numpy power iteration with the engine's damping/iterations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR
from zoom_spark.queries.text_analysis import TEXTRANK_TOPK

pytestmark = pytest.mark.usefixtures("spark")


def _referee_graph():
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text"])
    from collections import Counter

    cnt: Counter = Counter()
    for text in docs["text"]:
        toks = [t for t in text.lower().strip().split() if t]
        for a, b in zip(toks, toks[1:]):
            if a != b:
                cnt[(min(a, b), max(a, b))] += 1
    thr = float(np.percentile(sorted(cnt.values()), 75))
    edges = [k for k, v in cnt.items() if v > thr]
    return edges


def test_textrank_matches_numpy_power_iteration(spark):
    from zoom_spark.queries.text_analysis import textrank_keywords

    got = [(r["word"], r["rank_q6"]) for r in textrank_keywords(spark, SF_DIR).collect()]
    edges = _referee_graph()
    nodes = sorted({w for e in edges for w in e})
    ix = {w: i for i, w in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for a, b in edges:
        A[ix[a], ix[b]] = A[ix[b], ix[a]] = 1.0
    deg = A.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        # each sender j spreads r[j]/deg[j] along its edges
        r = (1 - 0.85) / n + 0.85 * (A @ (r / deg))
    order = sorted(range(n), key=lambda i: (-r[i], nodes[i]))[:TEXTRANK_TOPK]
    expect = [(nodes[i], r[i]) for i in order]
    assert [w for w, _ in got] == [w for w, _ in expect]
    for (gw, gr), (ew, er) in zip(got, expect):
        assert gr == pytest.approx(er, abs=1e-5)
    # the threshold must make the gate non-vacuous: ranks differ
    assert len({round(v, 6) for _, v in got}) > 1

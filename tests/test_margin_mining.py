"""Referee for margin-based mutual-kNN pair mining (R194): numpy
full-precision cosine matrix recompute of mutual top-1 pairs and
Artetxe-Schwenk ratio margins, plus structural mutuality properties.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR
from zoom_spark.queries.similarity_queries import MARGIN_K, MARGIN_PANEL

pytestmark = pytest.mark.usefixtures("spark")


def _cosine_matrix():
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    X = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    return ids, Xn @ Xn.T


def test_margin_pairs_match_numpy_referee(spark):
    from zoom_spark.queries.similarity_queries import margin_mutual_knn_pairs

    got = {
        (r["q_id"], r["c_id"]): (r["cosine_sim"], r["margin"])
        for r in margin_mutual_knn_pairs(spark, SF_DIR).collect()
    }
    ids, S = _cosine_matrix()
    id_to_ix = {v: i for i, v in enumerate(ids)}
    panel = [v for v in ids if v < MARGIN_PANEL]
    np.fill_diagonal(S, -np.inf)

    # q -> corpus ranks (ties broken by ascending corpus id, like the
    # engine); c -> panel ranks likewise
    def topk(sims, cand_ids, k):
        order = sorted(
            range(len(cand_ids)), key=lambda i: (-sims[i], cand_ids[i])
        )
        return [cand_ids[i] for i in order[:k]], [sims[i] for i in order[:k]]

    corpus_ids = list(ids)
    expect = {}
    qtop, qavg = {}, {}
    for qv in panel:
        qi = id_to_ix[qv]
        cands = [c for c in corpus_ids if c != qv]
        sims = [S[qi, id_to_ix[c]] for c in cands]
        top_ids, top_sims = topk(sims, cands, MARGIN_K)
        qtop[qv] = top_ids[0]
        qavg[qv] = float(np.mean(top_sims))
    ctop, cavg = {}, {}
    for cv in corpus_ids:
        ci = id_to_ix[cv]
        cands = [q for q in panel if q != cv]
        sims = [S[ci, id_to_ix[q]] for q in cands]
        top_ids, top_sims = topk(sims, cands, MARGIN_K)
        ctop[cv] = top_ids[0]
        cavg[cv] = float(np.mean(top_sims))
    for qv in panel:
        cv = qtop[qv]
        if ctop[cv] == qv:
            sim = S[id_to_ix[qv], id_to_ix[cv]]
            expect[(qv, cv)] = (sim, sim / ((qavg[qv] + cavg[cv]) / 2))
    # engine works on 6dp-rounded cosines: pair sets may only disagree
    # where two candidates tie at 6dp — require exact set equality
    # (the fixture has no such ties) and value agreement to ~1e-5
    assert set(got) == set(expect)
    for k, (sim, marg) in expect.items():
        assert got[k][0] == pytest.approx(sim, abs=2e-6)
        assert got[k][1] == pytest.approx(marg, abs=2e-5)
    assert len(got) > 0


def test_margin_pairs_are_mutual_and_unique(spark):
    from zoom_spark.queries.similarity_queries import margin_mutual_knn_pairs

    rows = margin_mutual_knn_pairs(spark, SF_DIR).collect()
    qs = [r["q_id"] for r in rows]
    cs = [r["c_id"] for r in rows]
    # top-1 is unique per side, so no id can repeat on its side
    assert len(qs) == len(set(qs))
    assert len(cs) == len(set(cs))
    for r in rows:
        assert r["margin"] > 0

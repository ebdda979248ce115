"""Referee for HITS hubs & authorities (R195): dense numpy mutual
power iteration over the same supplier->part adjacency, same iteration
count and normalization schedule — an independent algorithm path
(matrix-vector products vs the engine's join/aggregate rounds).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR

pytestmark = pytest.mark.usefixtures("spark")


def _numpy_hits(iterations: int = 8):
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    ).drop_duplicates()
    hubs = sorted(li["l_suppkey"].unique())
    auths = sorted(li["l_partkey"].unique())
    hi = {v: i for i, v in enumerate(hubs)}
    ai = {v: i for i, v in enumerate(auths)}
    A = np.zeros((len(hubs), len(auths)))
    for s, p in zip(li["l_suppkey"], li["l_partkey"]):
        A[hi[s], ai[p]] = 1.0
    a = np.ones(len(auths))
    h = None
    for _ in range(iterations):
        h = A @ a
        h /= np.linalg.norm(h)
        a = A.T @ h
        a /= np.linalg.norm(a)
    return hubs, auths, h, a


def test_hits_matches_numpy_power_iteration(spark):
    from zoom_spark.queries.advanced_analytics import hits_supplier_part

    rows = hits_supplier_part(spark, SF_DIR).collect()
    hubs, auths, h, a = _numpy_hits()
    got_h = [(r["node_id"], r["score_q6"]) for r in rows if r["side"] == "hub"]
    got_a = [(r["node_id"], r["score_q6"]) for r in rows if r["side"] == "auth"]
    # the sf0.001 fixture has fewer than 12 suppliers
    assert len(got_h) == min(12, len(hubs))
    assert len(got_a) == min(12, len(auths))

    def topk(ids, scores, k):
        order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))
        return [(ids[i], scores[i]) for i in order[:k]]

    exp_h = topk(hubs, h, min(12, len(hubs)))
    exp_a = topk(auths, a, min(12, len(auths)))
    assert [x[0] for x in got_h] == [x[0] for x in exp_h]
    assert [x[0] for x in got_a] == [x[0] for x in exp_a]
    for (gi, gs), (ei, es) in zip(got_h, exp_h):
        assert gs == pytest.approx(es, abs=1e-5)
    for (gi, gs), (ei, es) in zip(got_a, exp_a):
        assert gs == pytest.approx(es, abs=1e-5)


def test_hits_normalization_unit_l2(spark):
    """Full score vectors must be L2-normalized after the final
    half-step (authorities exactly; hubs normalized at their own
    half-step)."""
    from pyspark.sql import functions as F

    from zoom_spark.io import load_table
    from zoom_spark.operators.graph import hits

    li = load_table(spark, SF_DIR, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("hub"), F.col("l_partkey").alias("auth")
    ).distinct()
    hubs, auths = hits(edges, iterations=3)
    hn = hubs.agg(F.sum(F.col("h") * F.col("h"))).collect()[0][0]
    an = auths.agg(F.sum(F.col("a") * F.col("a"))).collect()[0][0]
    assert hn == pytest.approx(1.0, abs=1e-9)
    assert an == pytest.approx(1.0, abs=1e-9)

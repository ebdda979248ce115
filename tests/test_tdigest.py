"""Referees for the t-digest sketch (R203): rank-error bounds against
exact quantiles (numpy), weight conservation, tail-resolution
property, and partial->merge consistency.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR
from zoom_spark.operators.tdigest import compress, quantile

pytestmark = pytest.mark.usefixtures("spark")


def _rank_error(values: np.ndarray, est: float, q: float) -> float:
    return abs((values <= est).mean() - q)


def test_compress_conserves_weight_and_order():
    rng = np.random.default_rng(3)
    vals = rng.normal(0, 1, 5000)
    cents = compress([(float(v), 1.0) for v in vals])
    assert sum(w for _, w in cents) == pytest.approx(5000.0)
    means = [m for m, _ in cents]
    assert means == sorted(means)
    assert min(means) >= vals.min() and max(means) <= vals.max()


def test_quantiles_rank_accuracy_uniform_and_skewed():
    rng = np.random.default_rng(5)
    for vals in [
        rng.uniform(0, 1, 20000),
        rng.lognormal(0, 2, 20000),
    ]:
        cents = compress([(float(v), 1.0) for v in vals])
        for q in [0.01, 0.1, 0.5, 0.9, 0.99]:
            err = _rank_error(vals, quantile(cents, q), q)
            bound = 0.005 if q in (0.01, 0.99) else 0.02
            assert err <= bound, (q, err)


def test_merged_partials_keep_accuracy():
    """Split into 16 'partitions', digest each, merge the partial
    centroids once — the distributed path — and require the same
    rank-error bounds as the single-shot digest."""
    rng = np.random.default_rng(7)
    vals = rng.gamma(2.0, 3.0, 32000)
    parts = np.array_split(vals, 16)
    partials = []
    for p in parts:
        partials.extend(compress([(float(v), 1.0) for v in p]))
    merged = compress(partials)
    assert sum(w for _, w in merged) == pytest.approx(len(vals))
    for q in [0.01, 0.1, 0.5, 0.9, 0.99]:
        err = _rank_error(vals, quantile(merged, q), q)
        bound = 0.006 if q in (0.01, 0.99) else 0.02
        assert err <= bound, (q, err)


def test_gated_query_rank_accuracy(spark):
    from zoom_spark.queries.warehouse_ops import (
        TDIGEST_QS,
        tdigest_quantiles_prices,
    )

    rows = tdigest_quantiles_prices(spark, SF_DIR).collect()
    assert [r["q"] for r in rows] == TDIGEST_QS
    prices = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_totalprice"]
    )["o_totalprice"].to_numpy()
    for r in rows:
        err = _rank_error(prices, r["est"], r["q"])
        # sf0.001 has only 1500 orders: grid granularity 1/1500
        assert err <= 0.02, (r["q"], err)
    ests = [r["est"] for r in rows]
    assert ests == sorted(ests)  # quantile monotonicity

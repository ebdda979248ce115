"""Referee tests for round-7 operators (independent recomputations —
pandas/python, not the Spark code under test)."""

from __future__ import annotations

import datetime

import pandas as pd

from tests.conftest import SF_DIR


def _orders() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/orders.parquet")


def test_lakehouse_pipeline_stage_consistency(spark):
    """R242 referee: pandas replay of the whole maintenance pass —
    the CDC batch -> MERGE -> DIFF -> zone-map chain must be
    self-consistent (diff(merge(base, batch), base) == batch, the
    reference's §1.5 double-insert hazard inverted into an
    invariant), and every per-chunk stat must match an independent
    pandas recompute."""
    from zoom_spark.queries.round7_ops import (
        LH_PRED_DATE,
        lakehouse_maintenance_pipeline,
    )

    rows = lakehouse_maintenance_pipeline(spark, SF_DIR).collect()
    o = _orders()
    k = o["o_orderkey"]
    base = o[k % 97 != 0]
    ins = o[k % 97 == 0]
    upd = base[base["o_orderkey"] % 100 == 0]
    dels = base[
        (base["o_orderkey"] % 89 == 0) & (base["o_orderkey"] % 100 != 0)
    ]

    got = pd.DataFrame([r.asDict() for r in rows])
    # batch-level consistency: the diff reproduces the batch exactly
    assert int(got["n_inserted"].sum()) == len(ins)
    assert int(got["n_updated"].sum()) == len(upd)
    assert int(got["n_deleted"].sum()) == len(dels)
    assert int(got["n_rows"].sum()) == len(base) - len(dels) + len(ins)

    # chunk-level zone-map stats: updates don't move dates, so the
    # merged table's dates are base minus deletes plus inserts
    def chunk_of(s):
        d = pd.to_datetime(s)
        return d.dt.year * 12 + d.dt.month - 1

    merged_dates = pd.concat(
        [
            base[~base["o_orderkey"].isin(dels["o_orderkey"])][
                "o_orderdate"
            ],
            ins["o_orderdate"],
        ]
    )
    md = pd.DataFrame(
        {"chunk": chunk_of(merged_dates), "d": pd.to_datetime(merged_dates)}
    )
    zm = md.groupby("chunk")["d"].agg(["count", "min", "max"])
    got_i = got.set_index("chunk")
    assert set(got_i.index) == set(zm.index)
    pred = datetime.date.fromisoformat(LH_PRED_DATE)
    for chunk, row in zm.iterrows():
        g = got_i.loc[chunk]
        assert int(g["n_rows"]) == int(row["count"])
        assert g["min_date"] == row["min"].date()
        assert g["max_date"] == row["max"].date()
        assert bool(g["prunable"]) == (row["max"].date() < pred)

    # chunk-level change counts
    for name, frame in (
        ("n_inserted", ins),
        ("n_updated", upd),
        ("n_deleted", dels),
    ):
        exp = chunk_of(frame["o_orderdate"]).value_counts()
        for chunk, n in exp.items():
            assert int(got_i.loc[chunk][name]) == int(n), (name, chunk)
        assert int(got_i[name].sum()) == len(frame)

    # updates are real updates: repriced rows differ from base prices
    assert (upd["o_totalprice"] * 1.05).round(2).ne(
        upd["o_totalprice"]
    ).all()


def _copurchase_edges_pd() -> pd.DataFrame:
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    m = li.merge(li, on="l_orderkey")
    e = m[m["l_partkey_x"] < m["l_partkey_y"]][
        ["l_partkey_x", "l_partkey_y"]
    ].drop_duplicates()
    return e.rename(columns={"l_partkey_x": "u", "l_partkey_y": "v"})


def _degrees_pd(e: pd.DataFrame) -> pd.Series:
    return pd.concat([e["u"], e["v"]]).value_counts().sort_index()


def test_rich_club_matches_pandas(spark):
    """R244 referee: direct subgraph density recompute per k."""
    from zoom_spark.queries.round7_ops import (
        RC_MAX_K,
        rich_club_coefficients,
    )

    rows = {r["k"]: r for r in rich_club_coefficients(spark, SF_DIR).collect()}
    e = _copurchase_edges_pd()
    deg = _degrees_pd(e)
    assert set(rows) == set(range(1, RC_MAX_K + 1))
    for k in range(1, RC_MAX_K + 1):
        rich = set(deg[deg > k].index)
        ek = int(((e["u"].isin(rich)) & (e["v"].isin(rich))).sum())
        nk = len(rich)
        r = rows[k]
        assert r["n_nodes"] == nk and r["n_edges"] == ek
        if nk >= 2:
            assert abs(r["phi"] - 2.0 * ek / (nk * (nk - 1))) < 1e-6
        else:
            assert r["phi"] is None
    # phi grid is monotone-ish sanity: all defined values in [0, 1]
    assert all(
        rows[k]["phi"] is None or 0 <= rows[k]["phi"] <= 1
        for k in rows
    )


def test_modularity_brand_matches_pandas(spark):
    """R245 referee: per-community e_c/m - (d_c/2m)^2 recompute, plus
    the global invariants sum(e_c) <= m and sum(d_c) = 2m."""
    from zoom_spark.queries.round7_ops import modularity_brand_partition

    rows = modularity_brand_partition(spark, SF_DIR).collect()
    e = _copurchase_edges_pd()
    deg = _degrees_pd(e)
    brand = (
        pd.read_parquet(
            f"{SF_DIR}/part.parquet", columns=["p_partkey", "p_brand"]
        )
        .set_index("p_partkey")["p_brand"]
    )
    m = float(len(e))
    cu, cv = brand[e["u"]].values, brand[e["v"]].values
    internal = pd.Series(cu[cu == cv]).value_counts()
    dsum = (
        pd.DataFrame({"c": brand[deg.index].values, "d": deg.values})
        .groupby("c")["d"]
        .agg(["sum", "count"])
    )
    assert len(rows) == len(dsum)
    total_q = 0.0
    for r in rows:
        c = r["community"]
        ec = int(internal.get(c, 0))
        assert r["internal_edges"] == ec
        assert r["degree_sum"] == int(dsum.loc[c, "sum"])
        assert r["n_nodes"] == int(dsum.loc[c, "count"])
        q = ec / m - (dsum.loc[c, "sum"] / (2 * m)) ** 2
        assert abs(r["q_contribution"] - q) < 1e-6
        total_q += q
    assert sum(r["degree_sum"] for r in rows) == 2 * len(e)
    assert -1 <= total_q <= 1


def test_powerlaw_fit_matches_numpy(spark):
    """R246 referee: numpy polyfit of ln(CCDF) on ln(degree)."""
    import numpy as np

    from zoom_spark.queries.round7_ops import powerlaw_degree_fit

    [got] = powerlaw_degree_fit(spark, SF_DIR).collect()
    e = _copurchase_edges_pd()
    deg = _degrees_pd(e)
    hist = deg.value_counts().sort_index()
    n = hist.sum()
    # CCDF: P(D >= d) over distinct degrees
    p_ge = hist[::-1].cumsum()[::-1] / n
    lx = np.log(hist.index.values.astype(float))
    ly = np.log(p_ge.values)
    slope, intercept = np.polyfit(lx, ly, 1)
    assert got["n_distinct_degrees"] == len(hist)
    assert abs(got["ccdf_slope"] - slope) < 1e-5
    assert abs(got["ccdf_intercept"] - intercept) < 1e-5
    # a CCDF is non-increasing, so the fitted slope must be negative
    assert got["ccdf_slope"] < 0

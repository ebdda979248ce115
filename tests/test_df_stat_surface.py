"""DataFrameStatFunctions surface parity (df.stat.*): crosstab,
freqItems, sampleBy, cov/corr, approxQuantile. These are part of the
DataFrame API a reference user would expect to keep working; each is
pinned against an exact pandas/numpy referee (or a documented
guarantee, for the sketch-based ones) at sf0.001.

Reference parity note: the reference pipeline has no stats surface at
all (/root/reference/main.py is a REST ETL); this file pins the
SPARK-side API the engine exposes on top of it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from zoom_spark.io import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_crosstab_matches_pandas(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_type", "user_id")
    ct = ev.stat.crosstab("event_type", "user_id").toPandas()
    ct = ct.set_index("event_type_user_id").astype(int)
    ref = (
        ev.toPandas()
        .pivot_table(
            index="event_type",
            columns="user_id",
            aggfunc=len,
            fill_value=0,
        )
    )
    for et in ref.index:
        for uid in ref.columns:
            assert ct.loc[et, str(uid)] == ref.loc[et, uid]


def test_freq_items_contains_all_true_heavy_hitters(spark):
    # freqItems(support=s) guarantees every item with frequency > s
    # appears (may include false positives — that's the contract)
    ev = load_table(spark, SF_DIR, "events")
    found = set(
        ev.stat.freqItems(["event_type"], support=0.15).collect()[0][0]
    )
    counts = ev.groupBy("event_type").count().toPandas()
    n = counts["count"].sum()
    truly_frequent = set(
        counts[counts["count"] > 0.15 * n]["event_type"]
    )
    assert truly_frequent <= found


def test_sample_by_respects_fractions_and_seed(spark):
    ev = load_table(spark, SF_DIR, "events")
    fractions = {"purchase": 0.5, "view": 0.1}
    s1 = ev.sampleBy("event_type", fractions, seed=7)
    s2 = ev.sampleBy("event_type", fractions, seed=7)
    # deterministic under a fixed seed
    assert sorted(r["event_id"] for r in s1.collect()) == sorted(
        r["event_id"] for r in s2.collect()
    )
    got = {r["event_type"]: r["count"] for r in
           s1.groupBy("event_type").count().collect()}
    base = {r["event_type"]: r["count"] for r in
            ev.groupBy("event_type").count().collect()}
    assert set(got) <= set(fractions)  # unlisted strata are dropped
    for k, frac in fractions.items():
        # Bernoulli sampling: allow generous tolerance at n~2000/stratum
        assert abs(got.get(k, 0) / base[k] - frac) < 0.08


def test_cov_corr_match_numpy(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    cov = li.stat.cov("l_quantity", "l_extendedprice")
    corr = li.stat.corr("l_quantity", "l_extendedprice")
    pdf = li.select("l_quantity", "l_extendedprice").toPandas()
    x, y = pdf["l_quantity"].to_numpy(), pdf["l_extendedprice"].to_numpy()
    assert abs(cov - np.cov(x, y, ddof=1)[0, 1]) < abs(cov) * 1e-9 + 1e-6
    assert abs(corr - np.corrcoef(x, y)[0, 1]) < 1e-9


def test_approx_quantile_within_declared_error(spark):
    od = load_table(spark, SF_DIR, "orders")
    eps = 0.01
    qs = od.approxQuantile("o_totalprice", [0.25, 0.5, 0.75], eps)
    v = np.sort(od.select("o_totalprice").toPandas()["o_totalprice"].to_numpy())
    n = len(v)
    for p, got in zip([0.25, 0.5, 0.75], qs):
        # Greenwald-Khanna guarantee: rank error <= eps * n
        lo = v[max(0, int(np.floor((p - eps) * n)) - 1)]
        hi = v[min(n - 1, int(np.ceil((p + eps) * n)))]
        assert lo <= got <= hi, (p, got, lo, hi)


def test_cube_and_rollup_grand_totals_agree(spark):
    # cube/rollup are registered oracle queries; here pin the API-level
    # invariant: both produce the same grand-total row
    od = load_table(spark, SF_DIR, "orders")
    from pyspark.sql import functions as F

    cube = od.cube("o_orderstatus").agg(F.count("*").alias("n")).collect()
    roll = od.rollup("o_orderstatus").agg(F.count("*").alias("n")).collect()
    total = od.count()
    cube_gt = [r["n"] for r in cube if r["o_orderstatus"] is None]
    roll_gt = [r["n"] for r in roll if r["o_orderstatus"] is None]
    assert cube_gt == [total] and roll_gt == [total]


def test_observe_collects_metrics_without_extra_pass(spark):
    # df.observe: metrics accumulate during the SAME action (S16-style
    # instrumentation without a second scan)
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    od = load_table(spark, SF_DIR, "orders")
    obs = Observation("orders_metrics")
    observed = od.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_totalprice").alias("total"),
        F.max("o_orderdate").alias("max_day"),
    )
    kept = observed.where(F.col("o_totalprice") > 0).count()
    got = obs.get
    assert got["n_rows"] == od.count() == kept
    ref = od.agg(
        F.sum("o_totalprice").alias("t"), F.max("o_orderdate").alias("d")
    ).collect()[0]
    assert abs(got["total"] - ref["t"]) < 1e-6
    assert got["max_day"] == ref["d"]

"""Completes the Arrow/pandas API matrix (§2.10): scalar pandas_udf
and cogrouped applyInPandas — each checked against the equivalent
JVM-side plan. (mapInPandas, grouped applyInPandas, mapInArrow, UDTF,
and applyInPandasWithState are covered elsewhere.)"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from tests.conftest import SF_DIR
from zoom_spark.io import load_table


def test_scalar_pandas_udf_matches_jvm_norm(spark):
    """Vectorized scalar UDF (Arrow batches, no per-row Python) must
    equal the JVM fold for L2 norms."""
    from zoom_spark.functions.vectors import norm

    @pandas_udf("double")
    def l2(v: pd.Series) -> pd.Series:
        return v.map(lambda x: float(sum(t * t for t in x) ** 0.5))

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    both = emb.select(
        "vec_id",
        F.round(l2("v"), 9).alias("py_norm"),
        F.round(norm(F.col("v")), 9).alias("jvm_norm"),
    )
    assert both.where(F.col("py_norm") != F.col("jvm_norm")).count() == 0


def test_cogrouped_apply_in_pandas_matches_join_agg(spark):
    """cogroup().applyInPandas: per-key pair of pandas frames (events
    by user, orders by customer under the FIXTURES role mapping) —
    the escape hatch for per-key logic spanning TWO tables. Checked
    against the equivalent join+aggregate plan."""
    ev = load_table(spark, SF_DIR, "events").select("user_id", "value")
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_totalprice"
    )

    def summarize(key, ev_pdf: pd.DataFrame, ord_pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [len(ev_pdf)],
                "n_orders": [len(ord_pdf)],
                "total_value": [round(float(ev_pdf["value"].sum()), 2)],
            }
        )

    got = (
        ev.groupBy("user_id")
        .cogroup(orders.groupBy("user_id"))
        .applyInPandas(
            summarize,
            schema="user_id bigint, n_events bigint, n_orders bigint,"
            " total_value double",
        )
    )
    ref_ev = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2).alias(
            "total_value"
        ),
    )
    ref_or = orders.groupBy("user_id").agg(F.count("*").alias("n_orders"))
    ref = (
        ref_ev.join(ref_or, on="user_id", how="full_outer")
        .na.fill({"n_events": 0, "n_orders": 0, "total_value": 0.0})
        .select("user_id", "n_events", "n_orders", "total_value")
    )
    assert got.subtract(ref).count() == 0
    assert ref.subtract(got).count() == 0


def test_grouped_agg_pandas_udf_matches_jvm_weighted_mean(spark):
    """GROUPED_AGG pandas_udf (the Arrow UDAF form): per-status
    quantity-weighted mean price must equal the JVM sum/sum
    expression."""
    import numpy as np
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(s, float(q), float(p)) for s in ("A", "B", "C")
         for q, p in zip(range(1, 8), range(10, 80, 10))],
        "status string, qty double, price double",
    )

    @pandas_udf("double")
    def wmean(qty: pd.Series, price: pd.Series) -> float:
        return float(np.average(price, weights=qty))

    got = {
        r["status"]: r["wm"]
        for r in df.groupBy("status").agg(wmean("qty", "price").alias("wm")).collect()
    }
    expect = {
        r["status"]: r["wm"]
        for r in df.groupBy("status")
        .agg((F.sum(F.col("qty") * F.col("price")) / F.sum("qty")).alias("wm"))
        .collect()
    }
    assert set(got) == set(expect)
    for s in got:
        assert abs(got[s] - expect[s]) < 1e-9


def test_grouped_agg_pandas_udf_over_window(spark):
    """GROUPED_AGG UDFs are also valid over unbounded windows —
    per-partition mean via Arrow must equal F.avg over the window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(30)], "k int, v double"
    )

    @pandas_udf("double")
    def pmean(v: pd.Series) -> float:
        return float(v.mean())

    w = Window.partitionBy("k")
    rows = df.select(
        "k", "v", pmean("v").over(w).alias("m1"), F.avg("v").over(w).alias("m2")
    ).collect()
    for r in rows:
        assert abs(r["m1"] - r["m2"]) < 1e-9

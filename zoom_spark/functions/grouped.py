"""Grouped-map / grouped-aggregate Pandas functions (SURVEY.md §2.10).

The engine's UDF policy is Arrow-batched only (mapInPandas for
per-partition logic, applyInPandas for per-group logic) — never
row-at-a-time Python UDFs. applyInPandas executes as a real
distributed aggregate: rows shuffle on the grouping key, each group
arrives as one Arrow-backed pandas DataFrame, and only the small
result frame returns to the JVM — driver memory never sees the data;
skewed groups are the only scale hazard (bounded here: per-user event
counts).
"""

from __future__ import annotations

import pandas as pd


def slope_and_count(pdf: pd.DataFrame) -> pd.DataFrame:
    """OLS slope of y over x (covar_pop/var_pop — the regr_slope
    definition) plus the group size, one output row per group. x is
    centered first so cross-products don't cancel catastrophically
    when x is a large epoch offset."""
    x, y = pdf["x"], pdf["y"]
    xc = x - x.mean()
    denom = float((xc * xc).sum())
    slope = float((xc * (y - y.mean())).sum() / denom) if denom else float("nan")
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "slope_per_day": [slope],
            "n_events": [len(pdf)],
        }
    )

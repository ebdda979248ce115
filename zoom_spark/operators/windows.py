"""Window-function operators (SURVEY.md §2.5 — absent in the
reference; engine exposes Spark built-ins).

The flagship domain use is the per-key generalization of the
reference's global watermark MAX (/root/reference/main.py:261):
"latest meeting per host" == row_number over (partition by key order
by ts desc) = 1.

Scale: a window over partitionBy(key) is one shuffle on key; frames
evaluate without further shuffles. Skewed keys are handled by AQE
only for joins — for windows, pre-aggregate when the function allows
(e.g. max-per-key via groupBy) to keep partial aggregation map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, key: str, ts_col: str, tiebreak: str) -> DataFrame:
    """row_number()=1 per key, ordered by (ts desc, tiebreak desc) so
    the result is deterministic under timestamp ties."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).desc(), F.col(tiebreak).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    """Top-k = orderBy + limit; Catalyst compiles this to
    TakeOrderedAndProject (per-partition heap + driver merge — no full
    sort, no single-node shuffle) (SURVEY.md §2.6)."""
    return df.orderBy(*order_cols).limit(k)

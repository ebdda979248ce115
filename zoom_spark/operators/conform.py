"""Schema conformance & projection operators (SURVEY.md §2.2).

P1: the reference conforms Zoom_Users to a fixed 13-column contract via
pandas reindex — select listed columns in order, create missing ones as
NULL (/root/reference/main.py:65, contract config.py:28-42). Here it is
a pure projection, so Catalyst prunes the parquet scan down to the
contract columns (ReadSchema shows only them).

P5: nested-field projection with null defaults
(/root/reference/main.py:324-334) -> dot-path / get_json_object.

P6: literal column enrichment (/root/reference/main.py:110,165,182-183)
-> withColumn(lit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType


def conform_schema(
    df: DataFrame, contract: list[tuple[str, DataType | str]]
) -> DataFrame:
    """P1 — select + reorder + null-fill-missing against a (name, type)
    contract. Missing columns become typed NULL literals; extra columns
    are dropped; order follows the contract."""
    cols = []
    have = set(df.columns)
    for name, dtype in contract:
        if name in have:
            cols.append(F.col(name).cast(dtype).alias(name))
        else:
            cols.append(F.lit(None).cast(dtype).alias(name))
    return df.select(*cols)


def json_field(col: Column | str, path: str) -> Column:
    """P5/F8 — JSON field get with null default
    (/root/reference/main.py:326-334 .get() chains)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{path}")


def enrich_literal(df: DataFrame, **literals) -> DataFrame:
    """P6 — inject constant-valued columns (the reference tags each
    fetched child row with its parent key, main.py:110)."""
    for name, value in literals.items():
        df = df.withColumn(name, F.lit(value))
    return df

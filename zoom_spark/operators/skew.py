"""Skew-mitigation join strategies (SURVEY.md §4.3; task directive
"skewed keys -> salting or AQE skew-join").

AQE's skew-join split (on by default in session.py) handles skew
discovered at runtime for sort-merge joins. Salting is the explicit,
planner-independent form — required when (a) the skewed side feeds a
shuffled HASH join AQE won't split, or (b) the skew is known ahead
of time and you want deterministic task sizing:

  fact side: salt = hash(row) % n_salts appended to the key;
  dim side: exploded n_salts ways (each dim row duplicated per salt).

The join key becomes (key, salt): a hot key's rows spread across
n_salts tasks instead of one straggler. Cost: dim side inflates by
n_salts — only salt when the dim side is small relative to the skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_fact(fact: DataFrame, n_salts: int) -> DataFrame:
    """Append a deterministic per-row salt in [0, n_salts).
    xxhash64 over the whole row (via all columns) keeps it
    deterministic without requiring a unique id column."""
    return fact.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )


def explode_dim(dim: DataFrame, n_salts: int) -> DataFrame:
    """Duplicate every dim row once per salt value."""
    return dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the key space widened by a salt column; result
    is identical to fact.join(dim, on, how) but a hot key's probe work
    spreads across n_salts shuffle partitions."""
    keys = [on] if isinstance(on, str) else list(on)
    joined = salt_fact(fact, n_salts).join(
        explode_dim(dim, n_salts), on=keys + [SALT_COL], how=how
    )
    return joined.drop(SALT_COL)

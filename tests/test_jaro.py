"""Referees for Jaro-Winkler record linkage (R199): textbook known
values, bit-identical parity with DuckDB's independent C++
implementation over the FULL name-vocabulary pair set, and blocking
soundness for the gated query.
"""

from __future__ import annotations

import itertools

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_DIR
from zoom_spark.functions.jaro import jaro, jaro_winkler

pytestmark = pytest.mark.usefixtures("spark")


def test_textbook_values():
    assert jaro("martha", "marhta") == pytest.approx(0.944444444, abs=1e-8)
    assert jaro_winkler("martha", "marhta") == pytest.approx(
        0.961111111, abs=1e-8
    )
    assert jaro("dixon", "dicksonx") == pytest.approx(0.766666667, abs=1e-8)
    assert jaro_winkler("dixon", "dicksonx") == pytest.approx(
        0.813333333, abs=1e-8
    )
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("", "abc") == 0.0
    assert jaro_winkler("a", "b") == 0.0


def test_bitwise_parity_with_duckdb_over_vocabulary():
    """Every vocabulary pair must match DuckDB's independent C++
    implementation EXACTLY (==, not approx) — the two-implementation
    referee that backs the oracle contract."""
    con = duckdb.connect()
    names = [
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT p_name FROM '{SF_DIR}/part.parquet'"
        ).fetchall()
    ]
    assert len(names) >= 30
    for a, b in itertools.combinations(sorted(names), 2):
        dk = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler(a, b) == dk, (a, b)


def test_blocking_does_not_drop_qualifying_pairs(spark):
    """First-char blocking soundness at the gated threshold: recompute
    ALL pairs unblocked and check none above threshold is missed."""
    from zoom_spark.queries.round6_breadth import (
        JW_THRESHOLD,
        jaro_winkler_name_pairs,
    )

    got = {
        (r["name_a"], r["name_b"]): r["jw"]
        for r in jaro_winkler_name_pairs(spark, SF_DIR).collect()
    }
    names = sorted(
        pd.read_parquet(f"{SF_DIR}/part.parquet", columns=["p_name"])[
            "p_name"
        ].unique()
    )
    expect = {}
    for a, b in itertools.combinations(names, 2):
        v = jaro_winkler(a, b)
        blocked = a[0] == b[0] or a.split(" ")[-1] == b.split(" ")[-1]
        if v >= JW_THRESHOLD and blocked:
            expect[(a, b)] = v
        # empirical recall: on this vocabulary, the two-pass blocking
        # misses NO qualifying pair (single-key first-char blocking
        # does — e.g. 'cold anvil'/'old anvil')
        if v >= JW_THRESHOLD:
            assert blocked, (a, b, v)
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, abs=1e-6)
    assert len(got) > 0

"""Gate-safety guards: the round-4 postmortem made two promises —

1. no gated query may expose an output schema the driver's pandas
   canonicalizer can't digest (Array/Map/Struct/Decimal/Binary), and
2. the local harness must reproduce the driver's failure modes (list
   cells crash; Decimal-vs-float64 rendering mismatches), so a local
   green sweep predicts a driver green gate.

Test 1 lints every registry entry's ANALYZED schema (no execution —
building the DataFrame is enough). Tests 2-4 are harness regression
tests pinned to the exact r4 driver reds.
"""

from __future__ import annotations

import decimal

import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from tests.oracle_harness import canon_frame, lint_output_schema

SF_DIR = "/root/testdata/sf0.001"


def test_no_driver_unsafe_output_schemas(spark):
    """Every queries() entry must analyze to a canonicalizer-safe
    schema. This is the lint VERDICT r4 asked for: it would have
    caught collect_sorted_lines, label_centroids (arrays),
    incremental_agg_maintenance, gini_customer_spend (decimals),
    multimodal_features and approx_quantiles_prices before the driver
    did."""
    bad = {}
    for name, fn in entry_mod.queries().items():
        schema = fn(spark, SF_DIR).schema  # analysis only, no job
        risky = lint_output_schema(schema)
        if risky:
            bad[name] = risky
    assert not bad, f"driver-unsafe output columns: {bad}"


def test_canon_crashes_on_list_cells_like_the_driver():
    """r4 red: collect_sorted_lines returned array<int> and the
    driver's sort_values/factorize crashed. canon_frame must fail the
    same way, not tolerate it."""
    pdf = pd.DataFrame({"k": [1, 2], "v": [[1, 2], [3]]})
    with pytest.raises(TypeError):
        canon_frame(pdf)


def test_canon_renders_decimal_with_trailing_zeros():
    """r4 red: Spark Decimal('3005007.00') vs DuckDB float64 3005007.0.
    The harness must preserve that asymmetry, not normalize it away."""
    spark_side = pd.DataFrame({"x": [decimal.Decimal("3005007.00")]})
    duck_side = pd.DataFrame({"x": [3005007.0]})
    assert canon_frame(spark_side) != canon_frame(duck_side)


def test_canon_equates_date_and_midnight_timestamp():
    """DuckDB .df() widens DATE to midnight Timestamp while Spark
    keeps datetime.date; the driver graded those equal in r4
    (date_functions), so the harness must too."""
    import datetime as dt

    spark_side = pd.DataFrame({"d": [dt.date(1995, 1, 1)]})
    duck_side = pd.DataFrame({"d": [pd.Timestamp("1995-01-01 00:00:00")]})
    assert canon_frame(spark_side) == canon_frame(duck_side)
    # ...but a real time-of-day difference still fails
    duck_side2 = pd.DataFrame({"d": [pd.Timestamp("1995-01-01 03:00:00")]})
    assert canon_frame(spark_side) != canon_frame(duck_side2)


# --- _changed_names guards (r11 ADVICE: the --changed fast path must
# never produce a false green) -------------------------------------


def _fake_git(diff_files, untracked_files):
    """subprocess.run stand-in: first call is `git diff --name-only`,
    second is `git ls-files --others --exclude-standard`."""

    class _R:
        def __init__(self, out):
            self.stdout = out

    def run(cmd, **kw):
        if "ls-files" in cmd:
            return _R("\n".join(untracked_files) + "\n")
        return _R("\n".join(diff_files) + "\n")

    return run


def _fake_queries(mod: str):
    def fn(spark, sf_dir):  # pragma: no cover - never called
        raise AssertionError

    fn.__module__ = mod
    return {"some_query": fn}


def test_changed_names_harvests_untracked_query_modules(monkeypatch):
    """A brand-new, not-yet-added query module must enter the sweep —
    `git diff` alone never lists untracked files (r11 ADVICE)."""
    import scripts.check_oracle as co

    monkeypatch.setattr(
        co.subprocess, "run",
        _fake_git([], ["zoom_spark/queries/new_mod.py"]),
    )
    qs = _fake_queries("zoom_spark.queries.new_mod")
    assert co._changed_names(qs, "HEAD") == {"some_query"}


def test_changed_names_refuses_on_oracle_harness_change(monkeypatch):
    """tests/oracle_harness.py defines compare_query — the gate
    itself. A harness diff must refuse to narrow (return None), not
    fall into the blanket tests/ skip (r11 ADVICE)."""
    import scripts.check_oracle as co

    monkeypatch.setattr(
        co.subprocess, "run", _fake_git(["tests/oracle_harness.py"], [])
    )
    assert co._changed_names(_fake_queries("x"), "HEAD") is None


def test_changed_names_refuses_on_shared_module(monkeypatch):
    import scripts.check_oracle as co

    monkeypatch.setattr(
        co.subprocess, "run",
        _fake_git(["zoom_spark/operators/prefix.py"], []),
    )
    assert co._changed_names(_fake_queries("x"), "HEAD") is None


def test_changed_names_refuses_on_check_oracle_change(monkeypatch):
    """scripts/check_oracle.py holds _changed_names itself — the
    narrowing logic. Its own diff must refuse to narrow (return None),
    not self-certify via the blanket scripts/ skip (r12 ADVICE)."""
    import scripts.check_oracle as co

    monkeypatch.setattr(
        co.subprocess, "run",
        _fake_git(["scripts/check_oracle.py"], []),
    )
    assert co._changed_names(_fake_queries("x"), "HEAD") is None


def test_changed_names_skips_test_and_script_diffs(monkeypatch):
    """Plain test/script/entry diffs have no runtime effect on query
    results: empty pick set (caller prints 'nothing to sweep')."""
    import scripts.check_oracle as co

    monkeypatch.setattr(
        co.subprocess, "run",
        _fake_git(
            ["tests/test_merge.py", "scripts/audit_plans.py",
             "bench.py", "__spark_entry__.py", "BENCH_NOTES.md"],
            [],
        ),
    )
    assert co._changed_names(_fake_queries("x"), "HEAD") == set()

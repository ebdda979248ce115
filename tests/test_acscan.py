"""Referees for the Aho-Corasick blocklist scanner (R191): pure
``str.count``/``str.find`` recompute plus adversarial planted strings
(overlapping self-matches, nested patterns, shared prefixes) that
stress the automaton's fail links and the greedy non-overlap rule.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_DIR
from zoom_spark.functions.acscan import AhoCorasick

pytestmark = pytest.mark.usefixtures("spark")


ADVERSARIAL = [
    # (patterns, text): overlapping self-matches -> greedy == str.count
    (["aa"], "aaaa"),
    (["aa", "aaa"], "aaaaaa"),
    # nested patterns (one inside another)
    (["ab", "abab", "b"], "abababab"),
    # shared prefixes exercising fail links
    (["she", "he", "hers", "his"], "ushershehishers"),
    # pattern == whole text, and absent pattern
    (["xyz", "q"], "xyz"),
    # fail-link chain through mid-pattern mismatch
    (["abcd", "bcd", "cd", "d"], "abcxabcdabcd"),
    (["a a"], "a a a a a"),
]


def test_automaton_counts_match_str_count_on_adversarial_strings():
    for patterns, text in ADVERSARIAL:
        ac = AhoCorasick(patterns)
        counts, first = ac.count_nonoverlapping(text)
        for pid, p in enumerate(patterns):
            assert counts[pid] == text.count(p), (patterns, text, p)
        finds = [text.find(p) for p in patterns if text.find(p) >= 0]
        expect_first = (min(finds) + 1) if finds else 0
        assert first == expect_first, (patterns, text)


def test_automaton_finds_all_occurrences_in_scan():
    """scan() must report EVERY occurrence (including overlapping),
    cross-checked against a naive all-positions referee."""
    patterns = ["ab", "abab", "b", "ba"]
    text = "abababba"
    ac = AhoCorasick(patterns)
    got = sorted(ac.scan(text))
    expect = []
    for pid, p in enumerate(patterns):
        start = 0
        while True:
            i = text.find(p, start)
            if i < 0:
                break
            expect.append((pid, i))
            start = i + 1
    assert got == sorted(expect)


def test_blocklist_scan_matches_python_referee(spark):
    """End-to-end Spark referee on the sf0.001 corpus."""
    from zoom_spark.queries.text_analysis import (
        BLOCKLIST_FLAG_THRESHOLD,
        BLOCKLIST_TERMS,
        blocklist_scan_docs,
    )

    got = {
        r["doc_id"]: r for r in blocklist_scan_docs(spark, SF_DIR).collect()
    }
    docs = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    assert len(got) == len(docs)
    n_flagged = 0
    for did, text in zip(docs["doc_id"], docs["text"]):
        r = got[did]
        counts = [text.count(p) for p in BLOCKLIST_TERMS]
        finds = [text.find(p) for p in BLOCKLIST_TERMS if text.find(p) >= 0]
        assert r["n_terms"] == sum(1 for c in counts if c > 0)
        assert r["total_hits"] == sum(counts)
        expect_first = (min(finds) + 1) if finds else None
        assert r["first_hit_pos"] == expect_first
        assert r["flagged"] == (sum(counts) >= BLOCKLIST_FLAG_THRESHOLD)
        n_flagged += r["flagged"]
    # the contract must actually split the fixture corpus
    assert 0 < n_flagged < len(docs)

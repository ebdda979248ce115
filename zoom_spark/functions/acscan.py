"""Aho-Corasick multi-pattern substring scanning over a text column —
the blocklist/PII-term filter of a corpus curation pipeline.

Why Aho-Corasick: the naive spelling is one ``instr``/``replace`` pass
per pattern (P passes over every document). A production blocklist has
thousands of terms; the automaton matches ALL patterns in ONE pass per
document (O(len(text) + matches), independent of P), with the pattern
set shipped once per executor. The Spark shape is an Arrow-batched
``mapInPandas`` (no per-row Python UDF), so the scan streams through
each partition batch-by-batch with bounded memory.

Contract (oracle-verifiable): per pattern we report the GREEDY
LEFT-TO-RIGHT NON-OVERLAPPING occurrence count — exactly
``str.count`` semantics, i.e. ``(len(t) - len(t.replace(p, '')))
/ len(p)`` — so a SQL oracle can recompute it with ``replace``.
Accepting matches in increasing end-position order and skipping any
match that starts before the previously accepted match's end yields
precisely that count. Distinct patterns are counted independently
(overlaps across patterns allowed), matching per-pattern SQL.

No analog in the reference connector; SURVEY.md §2.11 text-analysis
extension family.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterator
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame


class AhoCorasick:
    """Classic goto/fail automaton over unicode code points."""

    def __init__(self, patterns: Sequence[str]):
        self.patterns = list(patterns)
        # trie: list of dict[char -> state]; fail links; output pattern ids
        self.goto: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.out: list[list[int]] = [[]]
        for pid, pat in enumerate(self.patterns):
            if not pat:
                raise ValueError("empty pattern")
            s = 0
            for ch in pat:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    nxt = len(self.goto)
                    self.goto.append({})
                    self.fail.append(0)
                    self.out.append([])
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s].append(pid)
        # BFS fail links
        q: deque[int] = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            s = q.popleft()
            for ch, t in self.goto[s].items():
                q.append(t)
                f = self.fail[s]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[t] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != t else 0
                self.out[t] = self.out[t] + self.out[self.fail[t]]

    def scan(self, text: str) -> list[tuple[int, int]]:
        """All matches as (pattern_id, start0) in increasing end order."""
        res: list[tuple[int, int]] = []
        s = 0
        for i, ch in enumerate(text):
            while s and ch not in self.goto[s]:
                s = self.fail[s]
            s = self.goto[s].get(ch, 0)
            for pid in self.out[s]:
                res.append((pid, i - len(self.patterns[pid]) + 1))
        return res

    def count_nonoverlapping(self, text: str) -> tuple[list[int], int]:
        """Per-pattern greedy non-overlapping counts (== str.count) and
        the 1-based position of the first match of ANY pattern (0 if
        none). Matches arrive in end order; greedy-accept per pattern."""
        counts = [0] * len(self.patterns)
        next_free = [0] * len(self.patterns)  # earliest allowed start
        first_pos = 0
        for pid, start in self.scan(text):
            if first_pos == 0 or start + 1 < first_pos:
                first_pos = start + 1
            if start >= next_free[pid]:
                counts[pid] += 1
                next_free[pid] = start + len(self.patterns[pid])
        return counts, first_pos


def blocklist_scan(
    docs: DataFrame,
    patterns: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_threshold: int = 8,
) -> DataFrame:
    """One-pass multi-pattern scan: per document, the number of
    distinct blocklist terms present, the total non-overlapping hit
    count, the 1-based first hit position (NULL if clean), and a
    flagged verdict (total hits >= `flag_threshold`)."""
    pats = tuple(patterns)
    thr = int(flag_threshold)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ac = AhoCorasick(pats)  # built once per partition
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                counts, first = ac.count_nonoverlapping(text or "")
                total = sum(counts)
                rows.append(
                    (
                        did,
                        sum(1 for c in counts if c > 0),
                        total,
                        first if first > 0 else None,
                        total >= thr,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "n_terms",
                    "total_hits",
                    "first_hit_pos",
                    "flagged",
                ],
            )

    schema = (
        f"{id_col} bigint, n_terms bigint, total_hits bigint, "
        "first_hit_pos bigint, flagged boolean"
    )
    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)

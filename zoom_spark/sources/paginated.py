"""Distributed rate-limited paginated-API fetcher (SURVEY.md §2.1
S1–S4 with wrappers S13–S15).

The reference walks paginated REST endpoints on the driver, one page
at a time (/root/reference/main.py:50-69 page-count loop,
main.py:95-121 cursor loop, main.py:269-302 keyed detail GET). The
Spark-first re-expression distributes the *keys* and keeps each
cursor chain sequential inside its task:

    keys DataFrame --repartition(n)--> mapInPandas(fetch per key)

so throughput scales with executors while respecting per-key cursor
ordering. Operational wrappers are reproduced inside the task:
  * retry w/ exponential backoff (S13; main.py:21-24 tenacity policy:
    3 attempts, x2 backoff, 4-10 s — here parameterized and without
    the tenacity dependency)
  * HTTP-429 rate-limit sleeps (S14; main.py:105-107)
  * domain error skip (S15; main.py:284-286 code-3001 swallow)

The client is pluggable (any Callable) so the harness is testable
offline with the deterministic MockPagedClient below; a real HTTP
client drops into the same signature. Parallelism is capped by
repartition(max_concurrency) — the lever for API rate budgets
(SURVEY.md §4.1 'batch size control' row).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


class TransientFetchError(Exception):
    """Retryable failure (network blip, 5xx)."""


class RateLimitError(Exception):
    """HTTP 429 — caller should sleep `retry_after` then resume."""

    def __init__(self, retry_after: float = 0.01):
        super().__init__("rate limited")
        self.retry_after = retry_after


class DomainSkipError(Exception):
    """Non-retryable domain error for one key (e.g. Zoom code 3001
    'meeting does not exist', /root/reference/main.py:284-286):
    skip the key, keep the run."""


@dataclass
class RetryPolicy:
    """S13 — mirrors the reference's tenacity config
    (3 attempts, exponential x2; /root/reference/main.py:21-24)."""

    attempts: int = 3
    base_delay: float = 0.05
    multiplier: float = 2.0


def _with_retry(fn: Callable, policy: RetryPolicy):
    delay = policy.base_delay
    for attempt in range(policy.attempts):
        try:
            return fn()
        except RateLimitError as e:  # S14: not an attempt, just wait
            time.sleep(e.retry_after)
        except TransientFetchError:
            if attempt == policy.attempts - 1:
                raise
            time.sleep(delay)
            delay *= policy.multiplier


def fetch_paginated(
    keys_df: DataFrame,
    fetch_page: Callable[[str, str | None], tuple[list[dict], str | None]],
    result_schema: StructType,
    key_col: str = "key",
    max_concurrency: int = 8,
    retry: RetryPolicy | None = None,
) -> DataFrame:
    """Fan out cursor-paginated fetches across executors.

    fetch_page(key, page_token) -> (rows, next_token); token None
    terminates the chain (S2 cursor loop). Each produced row is
    tagged with its key (P6, main.py:110). Keys are distributed;
    chains stay sequential per key.
    """
    policy = retry or RetryPolicy()
    out_cols = [f.name for f in result_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for key in pdf[key_col]:
                token: str | None = None
                while True:
                    try:
                        page, token = _with_retry(
                            lambda k=key, t=token: fetch_page(k, t), policy
                        )
                    except DomainSkipError:
                        break  # S15: skip this key entirely
                    rows.extend({**r, key_col: key} for r in page)
                    if not token:
                        break
            yield pd.DataFrame(
                rows if rows else {c: [] for c in out_cols}, columns=out_cols
            )

    return keys_df.repartition(max_concurrency, key_col).mapInPandas(
        run, schema=result_schema
    )


@dataclass
class MockPagedClient:
    """Deterministic offline stand-in for a paginated REST API.

    Per key: `pages_for(key)` pages of `page_size` rows. Injects a
    TransientFetchError on the first call for keys where
    key_int % fail_every == 0 (exercises S13) and a RateLimitError
    once per key where key_int % ratelimit_every == 0 (S14); keys in
    `missing` raise DomainSkipError (S15)."""

    page_size: int = 5
    max_pages: int = 3
    fail_every: int = 7
    ratelimit_every: int = 11
    missing: frozenset = frozenset()
    _seen: dict = field(default_factory=dict)

    def pages_for(self, key: str) -> int:
        # deterministic across processes (Python str hash is seeded)
        return (int(key) * 2654435761 % 2**31) % self.max_pages + 1

    def fetch_page(self, key: str, token: str | None):
        k = int(key)
        calls = self._seen.setdefault(key, {"calls": 0})
        calls["calls"] += 1
        if key in self.missing:
            raise DomainSkipError(key)
        if self.fail_every and k % self.fail_every == 0 and calls["calls"] == 1:
            raise TransientFetchError(f"transient for {key}")
        if (
            self.ratelimit_every
            and k % self.ratelimit_every == 0
            and calls.get("limited") is None
        ):
            calls["limited"] = True
            raise RateLimitError(retry_after=0.001)
        page_no = int(token) if token else 1
        n_pages = self.pages_for(key)
        rows = [
            {
                "item_id": k * 1000 + (page_no - 1) * self.page_size + i,
                "value": float(k + page_no + i),
            }
            for i in range(self.page_size)
        ]
        next_token = str(page_no + 1) if page_no < n_pages else None
        return rows, next_token

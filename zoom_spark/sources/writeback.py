"""External write-back sink (S11) — the reference's account
provisioning path (/root/reference/main.py:178-202): per-row POSTs
with log-and-continue error isolation, plus a batched group call.

Spark-first: `df.foreachPartition` so the POSTs run on executors
(parallel, no driver materialization), with per-row isolation
(main.py:188-194 catches HTTPError per user and continues). The
poster is a pluggable callable for offline testing.

This is a side-effecting sink, excluded from the DuckDB-gated query
surface (SURVEY.md §3.3).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def post_rows(
    df: DataFrame,
    post_fn: Callable[[dict], None],
    on_error: Callable[[dict, Exception], None] | None = None,
) -> None:
    """POST each row via post_fn; a failing row is reported to
    on_error and skipped — one bad record never aborts the batch
    (parity with main.py:190-194)."""

    def run(rows):
        for row in rows:
            d = row.asDict()
            try:
                post_fn(d)
            except Exception as e:  # noqa: BLE001 — per-row isolation
                if on_error is not None:
                    on_error(d, e)

    df.foreachPartition(run)

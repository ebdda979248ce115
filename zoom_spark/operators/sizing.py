"""Frame-sized partition counts for iterative operators.

Iterative graph/dedup loops (pagerank, star-contraction, label
propagation) re-shuffle a small working frame many times. Paying the
session-wide shuffle-partition count per round wastes task overhead on
near-empty partitions; hardcoding a small constant (round 4's
``coalesce(<=8)``) serializes the upstream stage and dies at scale.
The right number is a function of the frame: ~rows/target_rows_per_task,
clamped to the session's parallelism range.
"""

from __future__ import annotations


def frame_partitions(
    sc, n_rows: int, target_rows_per_task: int = 100_000
) -> int:
    """Partition count for an n_rows working frame: one task per
    ~target_rows_per_task rows, at least 2, at most 4x the cluster's
    core count (headroom for skew without drowning in empty tasks)."""
    want = -(-max(int(n_rows), 1) // target_rows_per_task)  # ceil div
    return max(2, min(4 * sc.defaultParallelism, want))

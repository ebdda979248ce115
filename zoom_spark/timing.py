"""Stage timing (SURVEY.md §2.1 S16 — /root/reference/timer.py:16-28).

The reference wraps each load stage in an @elapsed decorator that
logs seconds/minutes. Spark's own stage metrics live in the UI /
SparkListener; this lightweight decorator covers the driver-side
phases (plan build, collect boundaries) the listener doesn't see.
"""

from __future__ import annotations

import functools
import logging
import time
from collections.abc import Callable
from typing import TypeVar

logger = logging.getLogger("zoom_spark.timing")

F_ = TypeVar("F_", bound=Callable)


def format_elapsed(seconds: float) -> str:
    """Human-readable duration: seconds under a minute, else m+s
    (mirrors the reference's message shapes, timer.py:5-13)."""
    if seconds < 60:
        return f"{seconds:.2f} seconds"
    m, s = divmod(seconds, 60)
    return f"{int(m)} minutes {s:.2f} seconds"


def elapsed(fn: F_) -> F_:
    """Decorator: log wall time of the wrapped driver phase."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        try:
            return fn(*args, **kwargs)
        finally:
            logger.info(
                "%s completed in %s",
                fn.__qualname__,
                format_elapsed(time.perf_counter() - t0),
            )

    return wrapper  # type: ignore[return-value]

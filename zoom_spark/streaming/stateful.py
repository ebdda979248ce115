"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9 'stateful map/flatMap' row).

Exemplar: per-user running profile — cumulative event count, running
value sum, and last-seen timestamp — emitted per micro-batch. This is
the shape any custom accumulating operator takes (feature stores,
per-entity counters, online dedup caches): Arrow-batched per-key
pandas frames + an explicit state tuple + processing-time timeout for
state eviction.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_micros", LongType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [round(total, 2)],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_profile(events: DataFrame) -> DataFrame:
    """Stateful per-user accumulator over a streaming events frame."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas variant (Spark 4 arbitrary-state v2 API):
# same running-profile semantics, expressed as a StatefulProcessor with
# typed ValueState. Compared with applyInPandasWithState above, state
# here is a named, schema'd handle (composable: a processor can hold
# several value/list/map states) and timers are first-class.
# ---------------------------------------------------------------------------

from pyspark.sql.streaming import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningProfileProcessor(StatefulProcessor):
    """Per-user cumulative count/sum via ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "profile", "n_events BIGINT, sum_value DOUBLE"
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total = (0, 0.0)
        if self._state.exists():
            n, total = self._state.get()
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [round(total, 2)],
            }
        )

    def close(self) -> None:
        pass


TWS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def running_user_profile_v2(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas form of running_user_profile.

    Requires the RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass) and the protobuf
    package for the state-server protocol; the test gates on both.
    Kept alongside the applyInPandasWithState form so the engine
    exposes both stateful APIs."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningProfileProcessor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Streaming SPRT monitor: the always-valid sequential test as a
# stateful stream (batch twin: queries/experimentation.sprt_purchase_rate)
# ---------------------------------------------------------------------------

SPRT_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("k1", LongType()),
        StructField("decision_n", LongType()),
        StructField("decision", StringType()),
    ]
)

SPRT_OUTPUT_SCHEMA = StructType(
    [
        StructField("monitor", StringType()),
        StructField("n_obs", LongType()),
        StructField("llr", DoubleType()),
        StructField("decision_n", LongType()),
        StructField("decision", StringType()),
    ]
)


def _sprt_update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    from zoom_spark.queries.experimentation import (
        SPRT_C0,
        SPRT_C1,
        SPRT_LN_A,
        SPRT_LN_B,
    )

    n, k1, dec_n, dec = (
        state.get if state.exists else (0, 0, 0, "continue")
    )
    for pdf in batches:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        xs = (pdf["event_type"] == "purchase").to_numpy().astype("int64")
        ks = k1 + np.cumsum(xs)
        ns = n + np.arange(1, len(xs) + 1)
        llrs = ks * SPRT_C1 + (ns - ks) * SPRT_C0
        if dec == "continue":
            hit = np.nonzero((llrs >= SPRT_LN_A) | (llrs <= SPRT_LN_B))[0]
            if hit.size:
                i = int(hit[0])
                dec_n = int(ns[i])
                dec = (
                    "accept_h1" if llrs[i] >= SPRT_LN_A else "accept_h0"
                )
        n = int(ns[-1])
        k1 = int(ks[-1])
    state.update((n, k1, dec_n, dec))
    llr_now = (
        k1 * SPRT_C1 + (n - k1) * SPRT_C0
    )
    yield pd.DataFrame(
        {
            "monitor": [key[0]],
            "n_obs": [n],
            "llr": [round(llr_now, 6)],
            "decision_n": [dec_n],
            "decision": [dec],
        }
    )


def stream_sprt(events: DataFrame) -> DataFrame:
    """Streaming Wald SPRT on the purchase share: a SINGLE-key
    stateful accumulator (state = exact integer running counts plus
    the frozen first decision) emitting the monitor's current LLR and
    verdict each micro-batch. The decision, once crossed, never
    un-crosses (sequential-test semantics); within a batch rows are
    ordered by (ts, event_id), so with an ordered source the
    trajectory matches the batch twin
    `sprt_purchase_rate` exactly. State is four scalars — O(1)
    regardless of stream length."""
    keyed = events.withColumn("monitor", F.lit("purchase_rate"))
    return keyed.groupBy("monitor").applyInPandasWithState(
        _sprt_update,
        outputStructType=SPRT_OUTPUT_SCHEMA,
        stateStructType=SPRT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming Misra-Gries heavy hitters (mergeable summaries, Agarwal
# et al. PODS'12): sharded by token hash, O(k) state per shard
# ---------------------------------------------------------------------------

MG_CAPACITY = 16
MG_SHARDS = 4

MG_STATE_SCHEMA = StructType(
    [
        StructField("tokens", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n_seen", LongType()),
        StructField("decremented", LongType()),
    ]
)

MG_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("token", StringType()),
        StructField("approx_count", LongType()),
        StructField("n_shard", LongType()),
        StructField("max_undercount", LongType()),
    ]
)


def _mg_compress(counter: dict[str, int], k: int) -> tuple[dict[str, int], int]:
    """Reduce a counter to <= k entries the Misra-Gries way: subtract
    the (k+1)-th largest count from every entry and drop non-positive
    ones. Returns (summary, amount_subtracted). This is exactly the
    MERGE step of mergeable MG summaries, so state+batch merging
    preserves the undercount bound."""
    if len(counter) <= k:
        return counter, 0
    vals = sorted(counter.values(), reverse=True)
    sub = vals[k]
    out = {t: c - sub for t, c in counter.items() if c - sub > 0}
    return out, sub


def _mg_update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        tokens, counts, n_seen, decremented = state.get
        summary = dict(zip(tokens, counts))
    else:
        summary, n_seen, decremented = {}, 0, 0
    for pdf in batches:
        if not len(pdf):
            continue
        n_seen += len(pdf)
        batch_counts = pdf["token"].value_counts()
        for t, c in batch_counts.items():
            summary[t] = summary.get(t, 0) + int(c)
        summary, sub = _mg_compress(summary, MG_CAPACITY)
        decremented += sub
    state.update(
        (
            list(summary.keys()),
            [int(v) for v in summary.values()],
            int(n_seen),
            int(decremented),
        )
    )
    items = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
    yield pd.DataFrame(
        {
            "shard": [key[0]] * len(items),
            "token": [t for t, _ in items],
            "approx_count": [c for _, c in items],
            "n_shard": [n_seen] * len(items),
            "max_undercount": [decremented] * len(items),
        }
    )


def stream_heavy_hitters(
    events: DataFrame, token_col: str = "user_id"
) -> DataFrame:
    """Streaming Misra-Gries heavy hitters over a token stream,
    sharded by token hash so state parallelizes: each shard holds an
    O(k) summary of ITS OWN substream (a token maps to exactly one
    shard, so per-token guarantees are shard-local and exact-side:
    approx_count <= true <= approx_count + max_undercount, and any
    token with true count > n_shard/(k+1) is guaranteed present).
    The state+batch merge is the mergeable-summaries MG merge
    (subtract the (k+1)-th largest, drop non-positive), so the bound
    survives arbitrarily many micro-batches. State per shard is two
    length-<=k arrays — O(k), stream-length-independent."""
    keyed = events.select(
        F.col(token_col).cast("string").alias("token")
    ).withColumn(
        "shard", F.pmod(F.xxhash64("token"), F.lit(MG_SHARDS)).cast("long")
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _mg_update,
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

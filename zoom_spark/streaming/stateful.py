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

"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only stateful computation is the sequential innings
fold (pipeline_2026/ex_match_rb.py:127-154) — order-dependent running
score per (match, innings). In batch that lowers to window functions
(plans/bronze.py); in a true per-event stream the running totals need
keyed state that survives micro-batches. This module is that scale
path: Arrow-batched pandas state functions, one state row per key,
state size O(keys) not O(events).

Output mode is "update": each micro-batch emits one refreshed row per
key seen in that batch. Downstream sinks treat it as an upsert keyed on
the group columns (memory/Delta-merge sinks; append sinks would need
watermark-closed finals instead).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("total", T.DoubleType()), T.StructField("n", T.LongType())]
)


def running_totals_stateful(
    events: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Per-key running (sum, count) across micro-batches.

    Works on a streaming DataFrame (state persisted in the checkpoint)
    and, because applyInPandasWithState also accepts batch frames in
    Spark 4, on a batch frame as a one-shot fold. Emits
    (key, total_value, n_events) per key per batch.
    """

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            total, n = state.get
        else:
            total, n = 0.0, 0
        for pdf in pdfs:
            total += float(pdf[value_col].fillna(0.0).sum())
            n += len(pdf)
        state.update((total, n))
        yield pd.DataFrame(
            {"key": [key[0]], "total_value": [total], "n_events": [n]}
        )

    return (
        events.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fold,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_totals_tws(
    events: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """EXPERIMENTAL / dormant (env-blocked, unverified here — see
    COVERAGE.md "Dormant, environment-blocked"; the verified form of
    these semantics is ``running_totals_stateful`` above): the same
    per-key running fold on the Spark 4 transformWithState
    API (StatefulProcessor + typed ValueState, RocksDB-backed): the
    successor to applyInPandasWithState with composable state variables,
    timers, and TTL. Semantics here are identical to
    ``running_totals_stateful`` — the test asserts both agree with the
    batch aggregate — so callers can migrate APIs without a backfill.

    Requires ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider (in-box; set it on the session before the
    stream starts) and the ``protobuf`` package for the TWS Python
    driver worker (absent in this sandbox — the parity test
    auto-activates once it is importable)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):  # noqa: N802
            total, n = self._totals.get() if self._totals.exists() else (0.0, 0)
            for pdf in rows:
                total += float(pdf[value_col].fillna(0.0).sum())
                n += len(pdf)
            self._totals.update((total, n))
            yield pd.DataFrame(
                {"key": [key[0]], "total_value": [total], "n_events": [n]}
            )

        def close(self) -> None:
            pass

    return (
        events.select(key_col, value_col)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=RUNNING_TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


CUSUM_MONITOR_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("cusum", T.LongType()),
        T.StructField("n_alarms", T.LongType()),
        T.StructField("first_alarm_order", T.LongType()),
        T.StructField("cusum_at_alarm", T.LongType()),
    ]
)

_CUSUM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("psum", T.LongType()),
        T.StructField("pmin", T.LongType()),
        T.StructField("n_alarms", T.LongType()),
        T.StructField("first_alarm_order", T.LongType()),
        T.StructField("cusum_at_alarm", T.LongType()),
    ]
)


def cusum_monitor_stateful(
    events: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    delta_col: str = "d",
    threshold: int = 5_000_000,
) -> DataFrame:
    """Streaming twin of ``operators/timeseries.cusum_stat`` + the
    alarm query: per-key CUSUM drift monitoring that survives
    micro-batch boundaries with O(keys) state — the monitoring use
    case is inherently streaming (alarm WHEN drift crosses the
    threshold, not in tomorrow's batch).

    State per key is just (n_events, prefix_sum, prefix_min, n_alarms,
    first_alarm_order, cusum_at_alarm): the closed form
    S = P − min(0, min_prefix(P)) needs nothing else, so a billion-key
    stream carries six int64s per key (n_events is monotonic — sinks
    and tests use it to pick each key's latest emission without
    trusting append order). Deltas must be pre-quantized
    integers (the batch discipline); the per-batch fold is vectorized
    numpy (cumsum + minimum.accumulate), never a Python per-row loop.
    A key's micro-batch arrives as MULTIPLE Arrow chunks (split at
    spark.sql.execution.arrow.maxRecordsPerBatch, default 10k) in
    arbitrary cross-chunk order, so the fold materializes the whole
    key-batch and sorts ONCE globally before folding — sorting each
    chunk independently would mis-order the prefix sums for keys with
    >10k rows per batch. Batches must still arrive key-ordered in
    time (file streams replaying a log do; for out-of-order sources
    compose with a watermark sort upstream). Emits one refreshed row
    per key per batch (update mode): current statistic, alarm count,
    and the first threshold-crossing's order key and statistic."""
    import numpy as np

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_events, psum, pmin, n_alarms, first_o, first_cs = state.get
        else:
            n_events, psum, pmin, n_alarms, first_o, first_cs = (
                0, 0, 0, 0, None, None,
            )
        # Materialize every Arrow chunk of this key's micro-batch and
        # sort globally: cross-chunk delivery order is undefined and
        # the prefix-sum/prefix-min fold is order-dependent. State is
        # still O(keys); the transient batch frame is O(key-batch),
        # the same bound applyInPandasWithState already imposes.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order_col)
            d = pdf[delta_col].to_numpy(dtype="int64")
            p = psum + np.cumsum(d)
            m = np.minimum(np.minimum.accumulate(p), pmin)
            cs = p - m
            hits = np.flatnonzero(cs >= threshold)
            n_events += int(len(d))
            n_alarms += int(len(hits))
            if len(hits) and first_o is None:
                first_o = int(pdf[order_col].to_numpy()[hits[0]])
                first_cs = int(cs[hits[0]])
            psum, pmin = int(p[-1]), int(m[-1])
        state.update((n_events, psum, pmin, n_alarms, first_o, first_cs))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_events": [n_events],
                "cusum": [psum - min(0, pmin)],
                "n_alarms": [n_alarms],
                "first_alarm_order": [first_o],
                "cusum_at_alarm": [first_cs],
            }
        )

    return (
        events.select(key_col, order_col, delta_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fold,
            outputStructType=CUSUM_MONITOR_SCHEMA,
            stateStructType=_CUSUM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

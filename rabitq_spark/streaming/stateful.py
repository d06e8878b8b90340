"""Custom stateful streaming operator via applyInPandasWithState:
per-user running aggregates (event count, value sum, last-event time)
maintained as explicit keyed state across micro-batches.

This is the extension point Structured Streaming offers for operators its
built-ins can't express (SURVEY.md §2.6 — the reference has no streaming at
all). State is per-key and bounded by an idle timeout; each micro-batch
processes one Arrow-backed pandas frame per key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double, last_ts_us bigint"
STATE_SCHEMA = "n bigint, s double, last bigint"


def _update_user_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, s, last = state.get
    else:
        n, s, last = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        last = max(last, int(pdf["ts_us"].max()))
    state.update((n, s, last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [s],
            "last_ts_us": [last],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit keyed state.

    Emits the updated totals for every user touched by each micro-batch
    (update output mode).
    """
    from rabitq_spark._dist import ensure_package_on_executors

    ensure_package_on_executors(events.sparkSession)
    return (
        events.select("user_id", "value", "ts_us")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EWMA_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, last_value double, ewma double"
)
EWMA_STATE_SCHEMA = "n bigint, last double, ewma double"


def _update_ewma_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user EWMA state (alpha = 0.25, dyadic): the streaming twin of
    operators/timeseries.py::ewma_by_entity. Rows inside a micro-batch are
    folded in (ts_us, event_id) order; across batches the caller must feed
    time-ordered batches (ascending file staging) — then every step is the
    same IEEE double chain as the batch fold and the drained state equals
    it bit-for-bit (tests/test_stateful_streaming.py).

    The iterator is materialized and sorted ONCE: applyInPandasWithState
    only guarantees grouping-key clustering, so a key whose micro-batch
    spans multiple Arrow chunks (maxRecordsPerBatch) would otherwise fold
    chunks in arrival order, not global (ts_us, event_id) order."""
    (user_id,) = key
    if state.exists:
        n, last, ewma = state.get
    else:
        n, last, ewma = 0, 0.0, 0.0
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        rows = rows.sort_values(["ts_us", "event_id"])
        for v in rows["value"].astype(float):
            ewma = v if n == 0 else 0.25 * v + 0.75 * ewma
            last = v
            n += 1
    state.update((n, last, ewma))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "last_value": [last],
            "ewma": [ewma],
        }
    )


def streaming_ewma(events: DataFrame) -> DataFrame:
    """Streaming per-user EWMA with explicit keyed state (one double per
    user — bounded state regardless of stream length, unlike the batch
    collect-fold, which is why unbounded entities belong here)."""
    from rabitq_spark._dist import ensure_package_on_executors

    ensure_package_on_executors(events.sparkSession)
    return (
        events.select("user_id", "event_id", "value", "ts_us")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_ewma_state,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

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
        _, order = _sorted_ts_order(rows)
        for v in rows["value"].to_numpy(dtype="float64")[order]:
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


SESS_OUTPUT_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint, sum_value double"
)
# open session carried across micro-batches: start/last ts, count, and the
# value sum in integer CENTS (the corpus values are 2-decimal; an integer
# accumulator reproduces the batch DECIMAL(38,6) sum exactly, where a
# float fold would drift from the oracle's exact-decimal cast)
SESS_STATE_SCHEMA = "start bigint, last bigint, n bigint, cents bigint"

_GAP_US = 30 * 60 * 1_000_000

# Per-key output construction is THE hot path of every applyInPandasWithState
# operator: the function runs once per key per micro-batch, and a fresh
# 5-column typed-empty pd.DataFrame costs ~600 us, a 3-row sort_values
# ~400 us (measured round 11) — at the state probe's 100k keys/batch that
# is ~60 s/batch of pure construction overhead. The serializer only READS
# the yielded frame, so one shared immutable empty per schema is safe to
# yield from every no-emit call.
_SESS_COLS = [
    "user_id",
    "session_start_us",
    "session_end_us",
    "n_events",
    "sum_value",
]
_SESS_EMPTY = pd.DataFrame(
    {
        "user_id": pd.Series([], dtype="int64"),
        "session_start_us": pd.Series([], dtype="int64"),
        "session_end_us": pd.Series([], dtype="int64"),
        "n_events": pd.Series([], dtype="int64"),
        "sum_value": pd.Series([], dtype="float64"),
    }
)


def _sess_out(out: list) -> pd.DataFrame:
    """Session rows -> output frame (shared empty when nothing closed)."""
    return pd.DataFrame(out, columns=_SESS_COLS) if out else _SESS_EMPTY


def _sorted_ts_order(rows: pd.DataFrame):
    """(ts_arr, order) in exact (ts_us, event_id) ascending order — the
    same total order as the former rows.sort_values(["ts_us", "event_id"])
    ((ts, event_id) pairs are unique, so stability is moot), via one
    np.lexsort instead of a pandas sort (~25x cheaper on per-key chunks)."""
    import numpy as np

    ts = rows["ts_us"].to_numpy()
    order = np.lexsort((rows["event_id"].to_numpy(), ts))
    return ts[order], order


def _to_cents(values) -> "np.ndarray":
    """Exact integer-cents conversion with a loud contract check: the
    sessionizers accumulate sum_value in integer cents so the streaming
    fold is bit-identical to the batch DECIMAL(38,6) sum. That is only
    sound when every value carries <= 2 decimals — previously a comment;
    now a guard, so a corpus violation (extra decimals, NaN) raises here
    instead of silently drifting from the batch twin."""
    import numpy as np

    vals = np.asarray(values, dtype="float64")
    cents = np.rint(vals * 100.0)
    if not np.all(np.abs(cents / 100.0 - vals) <= 1e-9):
        bad = vals[np.abs(cents / 100.0 - vals) > 1e-9][:5]
        raise ValueError(
            "sessionize requires values with <= 2 decimal places "
            f"(exact-cents state contract); offending values: {bad}"
        )
    return cents.astype("int64")


def _update_session_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user gaps-and-islands sessionization with explicit keyed state —
    the applyInPandasWithState twin of operators/events.py::sessionize
    (same strict > gap rule). Each micro-batch folds its rows in global
    (ts_us, event_id) order (chunks materialized + sorted ONCE, same
    contract as _update_ewma_state); sessions that close inside the batch
    are emitted final, and the still-open session is emitted with its
    running aggregate so update-mode last-wins reads converge to the batch
    result when the stream drains. Production streams would add an
    event-time timeout to flush idle sessions; for run-to-completion
    equivalence the open-session emission suffices."""
    (user_id,) = key
    if state.exists:
        start, last, n, cents = state.get
    else:
        start, last, n, cents = -1, -1, 0, 0
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        # state unchanged; nothing to emit for this key this batch
        state.update((start, last, n, cents))
        yield _SESS_EMPTY
        return
    rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
    ts_arr, order = _sorted_ts_order(rows)
    cents_arr = _to_cents(rows["value"].to_numpy()[order])
    out: list[tuple] = []
    for ts, c in zip(ts_arr, cents_arr):
        ts = int(ts)
        if start < 0:
            start, last, n, cents = ts, ts, 1, int(c)
        elif ts - last > _GAP_US:
            out.append((user_id, start, last, n, cents / 100.0))  # closed
            start, last, n, cents = ts, ts, 1, int(c)
        else:
            last, n, cents = ts, n + 1, cents + int(c)
    state.update((start, last, n, cents))
    out.append((user_id, start, last, n, cents / 100.0))  # open (running)
    yield _sess_out(out)


def stateful_sessionize(events: DataFrame) -> DataFrame:
    """Streaming sessionization with explicit keyed state: one open-session
    tuple per user regardless of stream length (contrast the built-in
    F.session_window path, which buffers per-window state engine-side).
    Emits closed sessions finally and the open session's running aggregate
    each batch (update mode)."""
    from rabitq_spark._dist import ensure_package_on_executors

    ensure_package_on_executors(events.sparkSession)
    return (
        events.select("user_id", "event_id", "value", "ts_us")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_session_state,
            outputStructType=SESS_OUTPUT_SCHEMA,
            stateStructType=SESS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _update_session_timeout_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Watermarked sessionization update: the PRODUCTION form of
    _update_session_state. Emits a session only when it CLOSES — either a
    later in-batch event opens the next one, or the event-time watermark
    passes (last event + gap) and the state times out. Nothing is emitted
    for still-open sessions, so downstream consumers see each session
    exactly once (append semantics), and idle users' state is reclaimed by
    the timeout instead of living forever."""
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n, cents = state.get
        state.remove()
        yield _sess_out([(user_id, start, last, n, cents / 100.0)])
        return
    if state.exists:
        start, last, n, cents = state.get
    else:
        start, last, n, cents = -1, -1, 0, 0
    chunks = [pdf for pdf in pdfs if len(pdf)]
    out: list[tuple] = []
    if chunks:
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        ts_arr, order = _sorted_ts_order(rows)
        cents_arr = _to_cents(rows["value"].to_numpy()[order])
        for ts, c in zip(ts_arr, cents_arr):
            ts = int(ts)
            if start < 0:
                start, last, n, cents = ts, ts, 1, int(c)
            elif ts - last > _GAP_US:
                out.append((user_id, start, last, n, cents / 100.0))
                start, last, n, cents = ts, ts, 1, int(c)
            else:
                last, n, cents = ts, n + 1, cents + int(c)
    state.update((start, last, n, cents))
    # close when the watermark passes the gap boundary (epoch millis).
    # The deadline is clamped to watermark+1: with time-UNORDERED input
    # batches (e.g. id-sliced multi-replica corpora) a group's gap
    # boundary can already be behind the global watermark, and Spark
    # rejects past timestamps (measured at sf1.0: INVALID_TIMEOUT_
    # TIMESTAMP). Clamping defers the close to the next trigger — same
    # emissions on drain (the sentinel flush advances the watermark past
    # every timer), and any same-session stragglers still merge through
    # the data path before the timer fires.
    deadline = (last + 999) // 1000 + _GAP_US // 1000
    state.setTimeoutTimestamp(max(deadline, state.getCurrentWatermarkMs() + 1))
    yield _sess_out(out)


def stateful_sessionize_timeout(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked streaming sessionization with event-time state timeouts
    — the production shape (contrast stateful_sessionize, which emits
    running open-session aggregates for run-to-completion reads). Late
    data within `watermark` still lands in its session because the
    timeout only fires once the WATERMARK (not wall clock) passes
    last_event + gap; state for idle users is removed at that moment, so
    per-key state is bounded in TIME as well as size. Emits each session
    exactly once, when it closes."""
    from rabitq_spark._dist import ensure_package_on_executors

    ensure_package_on_executors(events.sparkSession)
    return (
        events.select("user_id", "event_id", "value", "ts_us", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_session_timeout_state,
            outputStructType=SESS_OUTPUT_SCHEMA,
            stateStructType=SESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

"""applyInPandasWithState: running per-user totals across micro-batches must
converge to the batch groupBy totals."""

import pandas as pd
from pyspark.sql import functions as F

from rabitq_spark.sources.tables import load_table
from rabitq_spark.streaming.pipeline import read_events_stream
from rabitq_spark.streaming.stateful import running_user_totals


def test_stateful_running_totals_converge_to_batch(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "ev_state")
    # several files -> several micro-batches (maxFilesPerTrigger=4)
    raw.repartition(8).write.parquet(src)

    stream = running_user_totals(read_events_stream(spark, src))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode appends one row per (user, micro-batch); the LAST row per
    # user is the final running total
    got = (
        spark.sql(
            """
            SELECT user_id, n_events, sum_value, last_ts_us FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY n_events DESC) AS rn
              FROM user_totals
            ) WHERE rn = 1
            """
        )
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    ev = load_table(spark, sf_dir, "events")
    want = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.max("ts_us").alias("last_ts_us"),
        )
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert got["last_ts_us"].tolist() == want["last_ts_us"].tolist()
    pd.testing.assert_series_equal(
        got["sum_value"], want["sum_value"], rtol=1e-9, check_exact=False
    )


def test_session_window_stream_equals_batch_sessionize(spark, sf_dir, tmp_path):
    """F.session_window streamed across several micro-batches must land
    exactly where the batch gaps-and-islands sessionize lands (end shifted
    by the gap) — including sessions whose events straddle batch files."""
    from rabitq_spark.operators.events import sessionize
    from rabitq_spark.streaming.pipeline import (
        run_complete_to_memory,
        session_window_stream,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "ev_sess")
    raw.repartition(8).write.parquet(src)

    got = (
        run_complete_to_memory(
            session_window_stream(read_events_stream(spark, src)),
            "sess_stream_test",
        )
        .select(
            "user_id",
            F.unix_micros("session_start").alias("start_us"),
            F.unix_micros("session_end").alias("end_us"),
            "n_events",
            "sum_value",
        )
        .toPandas()
        .sort_values(["user_id", "start_us"], ignore_index=True)
    )
    want = (
        sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30)
        .select(
            "user_id",
            F.unix_micros("session_start").alias("start_us"),
            (F.unix_micros("session_end") + 30 * 60 * 1_000_000).alias("end_us"),
            "n_events",
            "sum_value",
        )
        .toPandas()
        .sort_values(["user_id", "start_us"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_streaming_ewma_equals_batch_fold(spark, sf_dir, tmp_path):
    """Keyed-state streaming EWMA across time-ordered micro-batches must
    equal the batch ordered fold BIT-exactly (same IEEE chain, dyadic
    alpha)."""
    from rabitq_spark.operators.timeseries import ewma_by_entity
    from rabitq_spark.streaming.stateful import streaming_ewma

    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    src = str(tmp_path / "ewma_src")
    sl = n // 6 + 1
    for i in range(6):
        (
            ev.filter(
                (F.col("event_id") >= i * sl) & (F.col("event_id") < (i + 1) * sl)
            )
            .select("event_id", "ts", "user_id", "event_type", "value", "props")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    from rabitq_spark.streaming.pipeline import read_events_stream

    q = (
        streaming_ewma(read_events_stream(spark, src))
        .writeStream.format("memory")
        .queryName("ewma_state_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = (
        spark.sql(
            """
            SELECT user_id AS entity, n_events, last_value, ewma FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY n_events DESC) AS rn
              FROM ewma_state_test
            ) WHERE rn = 1
            """
        )
        .toPandas()
        .sort_values("entity", ignore_index=True)
    )
    want = (
        ewma_by_entity(ev).toPandas().sort_values("entity", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_streaming_ewma_multichunk_key_folds_in_order(spark, tmp_path):
    """A key whose micro-batch spans MULTIPLE Arrow chunks must still fold
    in global (ts_us, event_id) order (round-5 ADVICE: chunks used to be
    sorted independently and folded in arrival order). Forced with a tiny
    maxRecordsPerBatch and one 60-row key arriving scrambled."""
    import numpy as np

    from rabitq_spark.operators.timeseries import ewma_by_entity
    from rabitq_spark.streaming.pipeline import read_events_stream
    from rabitq_spark.streaming.stateful import streaming_ewma

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    rng = np.random.default_rng(7)
    n = 60
    order = rng.permutation(n)
    rows = [
        (
            int(i),                             # event_id
            int(1_000_000 + 1000 * i),          # ts (int64 micros in source)
            1,                                  # user_id: ONE key
            "view",
            float(np.round(rng.uniform(0, 100), 2)),
            "{}",
        )
        for i in order
    ]
    batch = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    src = str(tmp_path / "ewma_chunks")
    batch.coalesce(1).write.parquet(src)  # ONE file -> ONE micro-batch

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        q = (
            streaming_ewma(read_events_stream(spark, src))
            .writeStream.format("memory")
            .queryName("ewma_chunk_test")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = spark.sql(
        "SELECT ewma, last_value, n_events FROM ewma_chunk_test "
        "ORDER BY n_events DESC LIMIT 1"
    ).collect()[0]
    from rabitq_spark.sources.tables import events_with_micros

    ev = events_with_micros(spark.read.parquet(src))  # same ts normalization
    want = ewma_by_entity(ev).collect()[0]
    assert got["n_events"] == n
    assert got["ewma"] == want["ewma"]  # bit-exact IEEE chain
    assert got["last_value"] == want["last_value"]


def test_stateful_sessionize_spans_batches_and_chunks(spark, tmp_path):
    """Custom keyed-state sessionizer: a session spanning two micro-batches
    AND multiple Arrow chunks must drain to the batch gaps-and-islands
    result bit-exactly."""
    import numpy as np

    from rabitq_spark.operators.events import sessionize
    from rabitq_spark.sources.tables import events_with_micros
    from rabitq_spark.streaming.pipeline import read_events_stream
    from rabitq_spark.streaming.stateful import stateful_sessionize

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    rng = np.random.default_rng(11)
    gap_us = 30 * 60 * 1_000_000
    rows, eid = [], 0
    # a raw BIGINT ts column is read as legacy NANOS (events_with_micros:
    # ts_us = ts DIV 1000), so stage nanosecond values
    base = 1_700_000_000_000_000_000
    for user in (1, 2):
        t = base
        for sess in range(3):
            for _ in range(25):  # 25 events per session, > chunk size
                rows.append(
                    (eid, t, user, "view",
                     float(np.round(rng.uniform(0, 99), 2)), "{}")
                )
                eid += 1
                t += 60_000_000_000  # 1 min within session
            t += (gap_us + 1) * 1000  # strict > gap closes the session
    schema = ("event_id long, ts long, user_id long, event_type string, "
              "value double, props string")
    src = str(tmp_path / "sess_span")
    half = len(rows) // 2  # split MID-session: state must carry across
    spark.createDataFrame(rows[:half], schema).coalesce(1).write.mode(
        "append").parquet(src)
    spark.createDataFrame(rows[half:], schema).coalesce(1).write.mode(
        "append").parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    try:
        q = (
            stateful_sessionize(read_events_stream(spark, src))
            .writeStream.format("memory")
            .queryName("sess_span_test")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = (
        spark.sql(
            """
            SELECT user_id, session_start_us, session_end_us, n_events,
                   sum_value
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY user_id, session_start_us
                    ORDER BY n_events DESC) AS rn FROM sess_span_test)
            WHERE rn = 1
            """
        )
        .toPandas()
        .sort_values(["user_id", "session_start_us"], ignore_index=True)
    )
    ev = events_with_micros(spark.read.parquet(src))
    want = (
        sessionize(ev, gap_minutes=30)
        .select(
            "user_id",
            F.unix_micros("session_start").alias("session_start_us"),
            F.unix_micros("session_end").alias("session_end_us"),
            "n_events",
            "sum_value",
        )
        .toPandas()
        .sort_values(["user_id", "session_start_us"], ignore_index=True)
    )
    assert len(want) == 6
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_timeout_sessionize_emits_each_closed_session_once(spark, tmp_path):
    """Watermarked sessionizer (event-time timeouts): every session closes
    exactly once — by a later in-batch event or by the watermark passing
    last+gap — and the closed set equals the batch result. Sentinel events
    from a far-future user push the watermark so the real users' final
    sessions time out before the stream drains."""
    import numpy as np

    from rabitq_spark.operators.events import sessionize
    from rabitq_spark.sources.tables import events_with_micros
    from rabitq_spark.streaming.pipeline import read_events_stream
    from rabitq_spark.streaming.stateful import stateful_sessionize_timeout

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    rng = np.random.default_rng(23)
    gap_ns = 30 * 60 * 1_000_000_000
    rows, eid = [], 0
    base = 1_700_000_000_000_000_000  # nanos (BIGINT ts is read as nanos)
    last_ts = base
    for user in (1, 2):
        t = base
        for _ in range(3):
            for _ in range(10):
                rows.append(
                    (eid, t, user, "view",
                     float(np.round(rng.uniform(0, 99), 2)), "{}")
                )
                eid += 1
                t += 60_000_000_000
            t += gap_ns + 1_000
        last_ts = max(last_ts, t)
    schema = ("event_id long, ts long, user_id long, event_type string, "
              "value double, props string")
    src = str(tmp_path / "sess_timeout")
    # 8 data files -> 2 micro-batches at maxFilesPerTrigger=4
    sl = len(rows) // 8 + 1
    for i in range(8):
        part = rows[i * sl:(i + 1) * sl]
        if part:
            spark.createDataFrame(part, schema).coalesce(1).write.mode(
                "append").parquet(src)
    # two sentinel WAVES of 4 files each (= 2 more micro-batches): a
    # batch's watermark only applies to the NEXT batch's timeout sweep, so
    # wave A advances the watermark past every real session's last+gap and
    # wave B's batch fires the timeouts
    import time as _time

    for wave in (1, 2):
        _time.sleep(1.1)  # distinct file mtimes: the file source orders
        # triggers by modification time, and the waves must be separate
        far = last_ts + wave * 3 * gap_ns
        for j in range(4):
            spark.createDataFrame(
                [(10_000 + wave * 10 + j, far + j * 1_000_000_000, 999,
                  "view", 1.0, "{}")], schema
            ).coalesce(1).write.mode("append").parquet(src)

    stream_src = read_events_stream(spark, src)
    q = (
        stateful_sessionize_timeout(stream_src)
        .writeStream.format("memory")
        .queryName("sess_timeout_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = (
        spark.sql(
            "SELECT * FROM sess_timeout_test WHERE user_id IN (1, 2)"
        )
        .toPandas()
        .sort_values(["user_id", "session_start_us"], ignore_index=True)
    )
    # each session appears EXACTLY once
    assert got.duplicated(["user_id", "session_start_us"]).sum() == 0
    ev = events_with_micros(
        spark.read.parquet(src).filter("user_id IN (1, 2)")
    )
    want = (
        sessionize(ev, gap_minutes=30)
        .select(
            "user_id",
            F.unix_micros("session_start").alias("session_start_us"),
            F.unix_micros("session_end").alias("session_end_us"),
            "n_events",
            "sum_value",
        )
        .toPandas()
        .sort_values(["user_id", "session_start_us"], ignore_index=True)
    )
    assert len(want) == 6
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_exact=True
    )


def test_to_cents_contract_guard():
    """The exact-cents state accumulator must RAISE on values that violate
    the <=2-decimals corpus contract (round-6 ADVICE: the contract lived
    only in a comment, so a violating value silently corrupted sum_value
    relative to the batch DECIMAL(38,6) twin)."""
    import numpy as np
    import pytest

    from rabitq_spark.streaming.stateful import _to_cents

    assert list(_to_cents(np.array([1.25, -3.10, 0.0, 1e7]))) == [
        125, -310, 0, 1_000_000_000,
    ]
    with pytest.raises(ValueError, match="2 decimal"):
        _to_cents(np.array([1.234]))
    with pytest.raises(ValueError):
        _to_cents(np.array([float("nan")]))


def test_timeout_sessionizer_state_scale_rocksdb(spark):
    """State-scale stress of the watermarked sessionizer (round-6 verdict
    item 4), pytest-sized: 20k distinct users across 4 time-slab
    micro-batches with the ROCKSDB state store. Asserts the three scale
    claims the operator makes: (a) output == batch twin exactly, (b) state
    rows return to ~0 after the watermark passes (timeout eviction
    actually reclaims), (c) peak state is ~2 slabs of keys — bounded by
    the watermark horizon, never O(n_users). The 1M-user version of this
    exact probe runs in bench.py (state_scale_probe section)."""
    from rabitq_spark.streaming.state_probe import run_state_scale_probe

    out = run_state_scale_probe(
        spark, n_users=20_000, slabs=4, use_rocksdb=True, timeout_sec=300
    )
    assert out["rocksdb_used"], "RocksDB provider metrics absent"
    assert out["equal_gate"], (
        out["n_sessions_streamed"], out["n_sessions_batch"],
    )
    assert out["eviction_gate"], out["state_rows_per_batch"]
    assert out["peak_gate"], out["state_rows_per_batch"]
    # every user sessionized exactly once
    assert out["n_sessions_streamed"] == out["n_users"]

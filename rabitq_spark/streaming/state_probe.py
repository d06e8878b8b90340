"""State-scale stress harness for the watermarked keyed-state sessionizer
(streaming/stateful.py::stateful_sessionize_timeout) — the measurement
behind its 100×-scale claim (round-6 verdict item 4).

The probe stages a synthetic corpus of N distinct users split into S
time-slabs two hours apart (one parquet file per slab, written in mtime
order so the file source replays them as ordered micro-batches). Every
user's events live inside one slab, so as the watermark advances slab by
slab the previous slab's sessions MUST time out and their state MUST be
reclaimed: peak state-store rows stay at ~2 slabs' worth of keys (the slab
being filled plus the one whose timeout fires on the next batch's sweep),
never O(N). Two far-future sentinel batches (user −1) push the final
watermark so the tail flushes, after which the store must be ~empty.

Checks returned (bench gates + pytest assertions):
  * equal        — streamed closed-session set == batch gaps-and-islands
                   sessionize, exactly (same integer-cents sum contract)
  * peak_rows    — max state-store rows across micro-batches (gate: ≤ 2.5
                   slabs of users — bounded, NOT N)
  * final_rows   — state rows after the sentinel sweep (gate: ≤ 8 — the
                   timeout eviction actually reclaims)
  * rocksdb      — provider verification + memory/size metrics from the
                   query progress (RocksDB keeps state off-heap/on-disk,
                   the executor-memory story at 100× — sst file size is
                   the relevant ceiling, not JVM heap)
"""

from __future__ import annotations

import json
import shutil
import os
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_EPOCH0 = 1_700_000_000_000_000  # fixed epoch-micros base (no Date.now)
_SLAB_US = 2 * 3600 * 1_000_000
_GAP_US = 30 * 60 * 1_000_000
_SEQ = [0]


def run_state_scale_probe(
    spark: SparkSession,
    n_users: int,
    slabs: int = 10,
    events_per_user: int = 3,
    use_rocksdb: bool = True,
    timeout_sec: int = 600,
) -> dict:
    import numpy as np
    import pandas as pd

    from rabitq_spark.operators.events import sessionize
    from rabitq_spark.streaming.stateful import stateful_sessionize_timeout

    u_per_slab = n_users // slabs
    n_users = u_per_slab * slabs
    src = tempfile.mkdtemp(prefix="state_scale_")
    epu = events_per_user

    def gen_slab(s):
        def gen(it):
            for pdf in it:
                uids = pdf["id"].values.astype(np.int64)
                base = _EPOCH0 + s * _SLAB_US
                uid = np.repeat(uids, epu)
                j = np.tile(np.arange(epu, dtype=np.int64), len(uids))
                # all of a user's events within ~12 min of the slab base:
                # one session per user, closed only by the watermark
                ts = base + (uid % 600) * 1_000_000 + j * 60_000_000
                yield pd.DataFrame(
                    {
                        "event_id": uid * epu + j,
                        "ts_us": ts,
                        "user_id": uid,
                        # exact 2-decimal values (the cents contract)
                        "value": ((uid * 7 + j * 13) % 10_000) / 100.0,
                    }
                )

        return (
            spark.range(s * u_per_slab, (s + 1) * u_per_slab)
            .repartition(8)
            .mapInPandas(
                gen, "event_id bigint, ts_us bigint, user_id bigint, value double"
            )
        )

    from rabitq_spark.streaming.pipeline import stamp_staged_files

    t0 = time.perf_counter()
    for s in range(slabs):
        seen = set(os.listdir(src)) if s else set()
        (
            gen_slab(s)
            .withColumn("ts", F.timestamp_micros("ts_us"))
            .select("event_id", "ts", "ts_us", "user_id", "value")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        # distinct, strictly ordered mtimes: the file source orders by them
        # (round 11: utime stamps replace ~1 s ordering sleeps per append)
        stamp_staged_files(src, seen)
    max_us = _EPOCH0 + (slabs - 1) * _SLAB_US + 600 * 1_000_000 + epu * 60_000_000
    for wave in (1, 2):  # wave A advances the watermark; wave B's batch
        seen = set(os.listdir(src))  # sweeps the timeouts it enabled
        far = max_us + wave * 3 * _GAP_US
        (
            spark.createDataFrame(
                [(10_000_000_000 + wave, far, -1, 0.0)],
                "event_id long, ts_us long, user_id long, value double",
            )
            .select(
                "event_id",
                F.timestamp_micros("ts_us").alias("ts"),
                "ts_us",
                "user_id",
                "value",
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        stamp_staged_files(src, seen)
    gen_sec = time.perf_counter() - t0

    schema = "event_id bigint, ts timestamp, ts_us bigint, user_id bigint, value double"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    try:
        old_provider = spark.conf.get(conf_key)
    except Exception:
        old_provider = None
    if use_rocksdb:
        spark.conf.set(conf_key, _ROCKSDB_PROVIDER)
    _SEQ[0] += 1
    name = f"state_scale_probe_{_SEQ[0]}"
    t0 = time.perf_counter()
    try:
        q = (
            stateful_sessionize_timeout(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(timeout_sec)
        if not finished:
            q.stop()
            raise TimeoutError(f"state-scale stream not done in {timeout_sec}s")
        stream_sec = time.perf_counter() - t0
        prog = [json.loads(p.json) for p in q.recentProgress]
    finally:
        if use_rocksdb:
            if old_provider is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, old_provider)

    ops = [p["stateOperators"][0] for p in prog if p.get("stateOperators")]
    rows = [op["numRowsTotal"] for op in ops]
    custom = [op.get("customMetrics", {}) for op in ops]
    rocksdb_used = any(k.startswith("rocksdb") for m in custom for k in m)
    sst_peak = max((m.get("rocksdbSstFileSize", 0) for m in custom), default=0)
    pinned_peak = max(
        (m.get("rocksdbPinnedBlocksMemoryUsage", 0) for m in custom), default=0
    )

    got = (
        spark.sql(
            f"SELECT user_id, session_start_us, session_end_us, n_events, "
            f"sum_value FROM {name} WHERE user_id >= 0"
        )
        .toPandas()
        .sort_values(["user_id", "session_start_us"], ignore_index=True)
    )
    want = (
        sessionize(spark.read.parquet(src).filter("user_id >= 0"), gap_minutes=30)
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
    equal = bool(got.equals(want))
    spark.catalog.dropTempView(name)
    shutil.rmtree(src, ignore_errors=True)

    peak = max(rows) if rows else -1
    final = rows[-1] if rows else -1
    return {
        "n_users": n_users,
        "slabs": slabs,
        "events_per_user": epu,
        "rocksdb_requested": use_rocksdb,
        "rocksdb_used": rocksdb_used,
        "gen_sec": round(gen_sec, 1),
        "stream_sec": round(stream_sec, 1),
        "n_sessions_streamed": int(len(got)),
        "n_sessions_batch": int(len(want)),
        "state_rows_per_batch": rows,
        "peak_state_rows": peak,
        "final_state_rows": final,
        "rocksdb_sst_bytes_peak": int(sst_peak),
        "rocksdb_pinned_mem_peak": int(pinned_peak),
        "equal_gate": equal,
        # bounded-state claim: peak is ~2 slabs (fill + sweep), never O(N)
        "peak_gate": peak <= 2.5 * u_per_slab,
        # reclamation claim: after the sentinel sweep only the sentinel's
        # own open session may remain
        "eviction_gate": 0 <= final <= 8,
    }

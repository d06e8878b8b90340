"""Structured Streaming pipelines over the events stream.

The reference has no streaming surface (SURVEY.md §2.6) — this is
north-star extension territory. The logical plans here are the SAME
operators as rabitq_spark.operators.events (tumbling window agg, dedup);
Structured Streaming adds watermarks and state management. Batch/stream
equivalence is the test contract: running the stream to completion over a
static directory must reproduce the batch aggregate exactly.

Scale notes: windowed aggregation state is bounded by the watermark horizon;
dropDuplicatesWithinWatermark keeps the dedup state finite. Both shuffle by
the aggregation key, same as batch.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _events_raw_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def stamp_staged_files(src: str, before: set[str], step_s: float = 2.0) -> None:
    """Stamp files appended to `src` since `before` (an os.listdir snapshot)
    with an mtime strictly greater than every pre-existing file's.

    The file stream source replays files in modification-time order; staging
    loops previously guaranteed that order with wall-clock sleeps between
    appends (~1 s per append — sequential writes can tie within the source's
    millisecond granularity). An explicit utime gives the same strict
    ordering deterministically and for free. `step_s` keeps successive
    stamps ≥ 2 s apart, far above the source's ms resolution.
    """
    import os

    prev = max(
        (os.stat(os.path.join(src, f)).st_mtime for f in before),
        default=time.time(),
    )
    stamp = prev + step_s
    for f in set(os.listdir(src)) - before:
        p = os.path.join(src, f)
        os.utime(p, (stamp, stamp))


def read_events_stream(
    spark: SparkSession, events_path: str, glob: str | None = None
) -> DataFrame:
    """File-source stream over events parquet.

    `events_path` must be a directory (file-source requirement); pass a
    single file as (parent_dir, glob="file.parquet"). A file source needs an
    explicit schema, and the driver's events ts column has changed physical
    type across generations (TIMESTAMP(NANOS) → timestamp[us]); peek at the
    batch-read footer schema (metadata-only) and mirror whatever type the
    batch loader would see, then apply the same exact ts normalization.
    maxFilesPerTrigger bounds per-microbatch work.
    """
    import os

    from rabitq_spark.sources.tables import events_with_micros

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if glob is None and events_path.endswith(".parquet"):
        events_path, glob = os.path.dirname(events_path), os.path.basename(events_path)
    probe_path = events_path if glob is None else os.path.join(events_path, glob)
    ts_type = spark.read.parquet(probe_path).schema["ts"].dataType
    reader = spark.readStream.schema(_events_raw_schema(ts_type)).option(
        "maxFilesPerTrigger", "4"
    )
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.parquet(events_path)
    return events_with_micros(raw)


def windowed_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling-window count/sum with late-data watermark — the streaming
    twin of operators.events.tumbling_window_agg. Pass `slide` for hopping
    windows (each event lands in window/slide overlapping windows; state
    grows by the same factor, still watermark-bounded)."""
    win = F.window("ts", window) if slide is None else F.window("ts", window, slide)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value"
        )
    )


def session_window_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming sessionization via F.session_window — the stateful
    merging-window operator (state is open sessions per user, closed and
    emitted once the watermark passes session_end). Semantics probe
    (verified on this Spark): an event exactly `gap` after the previous one
    MERGES (new session iff diff > gap), identical to the batch
    operators.events.sessionize islands formulation; window end is
    last_ts + gap. The streaming twin of `sessionize` — same oracle shape
    with session_end shifted by the gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming dedup on event_id with bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_complete_to_memory(
    stream_df: DataFrame, query_name: str, timeout_sec: int = 120
) -> DataFrame:
    """Run an aggregating stream to completion (availableNow) into a memory
    sink in complete mode; returns the final result as a batch DataFrame."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"stream {query_name!r} did not finish in {timeout_sec}s; "
            "a partial memory-sink read would be silently incomplete"
        )
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")

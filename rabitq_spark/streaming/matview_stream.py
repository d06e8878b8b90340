"""Streaming incremental materialized-view maintenance: keep a per-key
aggregate state current from an event stream, one state merge per
micro-batch.

This is the streaming twin of operators/matview.py — the same
self-maintainable algebra (COUNT/SUM add in DECIMAL, MIN/MAX by
least/greatest), driven by foreachBatch instead of a planned backfill.
Because DECIMAL addition is exact and associative, the state after N
micro-batches is bit-identical to a full batch recompute regardless of how
the stream was sliced — the invariant the `stream_incremental_agg` oracle
checks end-to-end.

State storage is versioned Parquet (state_dir/v{batch_id}): each batch
reads the previous version, merges the batch's delta aggregate, writes the
next version — a poor man's lakehouse commit. Replays under at-least-once
delivery would double-merge a batch; production would write through a
transactional table format keyed by batchId (same caveat as the streaming
index append).

Scale shape per batch: delta aggregate shuffles only batch rows; the merge
join is O(|state| + |delta|) — with the state bucketed by key it is
exchange-free on the state side, so steady-state cost tracks the DELTA, not
history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from rabitq_spark.operators.matview import agg_state, merge_agg_state


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream of (event_id, user_id, value) parquet rows."""
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def maintain_agg_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    keys: list[str],
    sum_cols: list[str] | None = None,
    minmax_cols: list[str] | None = None,
    timeout_sec: int = 120,
) -> str:
    """Run the stream to completion (availableNow), merging each micro-batch
    into the versioned aggregate state. Returns the path of the final state
    version (read it with spark.read.parquet)."""
    latest: list[str] = []

    def upsert_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        delta = agg_state(batch, keys, sum_cols, minmax_cols)
        if latest:
            prev = spark.read.parquet(latest[-1])
            merged = merge_agg_state(
                prev, delta, keys, sum_cols, minmax_cols
            )
        else:
            merged = delta
        out = f"{state_dir}/v{batch_id}"
        merged.write.mode("overwrite").parquet(out)
        latest.append(out)

    q = (
        stream.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError("aggregate maintenance stream did not finish")
    if not latest:
        raise RuntimeError("stream produced no micro-batches")
    return latest[-1]


def maintain_agg_stream_partitioned(
    stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    keys: list[str],
    sum_cols: list[str] | None = None,
    minmax_cols: list[str] | None = None,
    n_buckets: int = 32,
    timeout_sec: int = 120,
) -> str:
    """The AT-SCALE form of maintain_agg_stream: state lives in ONE
    bucket-partitioned Parquet table (bucket = pmod(hash(keys), n_buckets))
    and each micro-batch rewrites ONLY the buckets its delta touches, via
    dynamic partition overwrite — per-batch I/O is O(|delta| + touched
    buckets), not O(|state|) as in the versioned-copy form. This is how a
    100 TB state absorbs a small delta: untouched buckets are never read
    or written.

    Returns the state table path; read it with spark.read.parquet and drop
    the `__bucket` column.
    """
    from pyspark.sql import functions as F

    done: list[int] = []

    def bucketed(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "__bucket", F.pmod(F.hash(*keys), F.lit(n_buckets))
        )

    def upsert_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            delta = bucketed(agg_state(batch, keys, sum_cols, minmax_cols))
            if done:
                # read ONLY the touched buckets of the existing state —
                # the IN-filter prunes untouched partitions at the scan
                touched = [
                    r["__bucket"]
                    for r in delta.select("__bucket").distinct().collect()
                ]
                prev = spark.read.parquet(state_dir).filter(
                    F.col("__bucket").isin(touched)
                )
                merged = merge_agg_state(
                    prev.drop("__bucket"),
                    delta.drop("__bucket"),
                    keys,
                    sum_cols,
                    minmax_cols,
                )
                # materialize BEFORE the write: the merged plan reads the
                # same path the dynamic overwrite writes; the checkpoint
                # cuts the file-source lineage so this is a safe
                # read-then-replace
                out = bucketed(merged).localCheckpoint(eager=True)
            else:
                out = delta
            (
                out.repartition("__bucket")
                .write.mode("overwrite")
                .partitionBy("__bucket")
                .parquet(state_dir)
            )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )
        done.append(batch_id)

    q = (
        stream.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError("partitioned aggregate maintenance did not finish")
    if not done:
        raise RuntimeError("stream produced no micro-batches")
    return state_dir

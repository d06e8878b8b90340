"""Incremental materialized-view maintenance: merge == recompute, and
retraction via negated delta states."""

from pyspark.sql import functions as F

from rabitq_spark.operators.matview import (
    agg_state,
    incremental_refresh,
    merge_agg_state,
)
from rabitq_spark.sources.tables import load_table


def _norm(df):
    return df.toPandas().sort_values("user_id", ignore_index=True)


def test_incremental_refresh_equals_recompute(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    hist = ev.filter("event_id % 5 != 0")
    delta = ev.filter("event_id % 5 = 0")
    keys, sums, mm = ["user_id"], ["value"], ["value"]
    merged = incremental_refresh(agg_state(hist, keys, sums, mm), delta, keys, sums, mm)
    full = agg_state(ev, keys, sums, mm)
    assert _norm(merged).equals(_norm(full))


def test_disjoint_keys_pass_through(spark):
    rows = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], ["user_id", "value"]
    )
    other = spark.createDataFrame([(3, 30.0)], ["user_id", "value"])
    s = merge_agg_state(
        agg_state(rows, ["user_id"], ["value"], ["value"]),
        agg_state(other, ["user_id"], ["value"], ["value"]),
        ["user_id"],
        ["value"],
        ["value"],
    )
    out = _norm(s)
    assert list(out.user_id) == [1, 2, 3]
    assert list(out.cnt) == [1, 1, 1]


def test_retraction_by_negated_state(spark):
    rows = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 7.0)], ["user_id", "value"]
    )
    retract = spark.createDataFrame([(1, 5.0), (2, 7.0)], ["user_id", "value"])
    keys, sums = ["user_id"], ["value"]
    state = agg_state(rows, keys, sums)
    neg = agg_state(retract, keys, sums).select(
        "user_id", (-F.col("cnt")).alias("cnt"), (-F.col("sum_value")).alias("sum_value")
    )
    out = _norm(merge_agg_state(state, neg, keys, sums))
    # user 2 fully retracted (count 0 -> dropped); user 1 keeps 10.0
    assert list(out.user_id) == [1]
    assert list(out.cnt) == [1]
    assert float(out.sum_value.iloc[0]) == 10.0


def test_stream_maintenance_equals_batch(spark, tmp_path):
    import os

    from rabitq_spark.streaming.matview_stream import (
        maintain_agg_stream,
        read_event_stream,
    )

    rows = [(i, i % 7, float(i) / 3.0) for i in range(200)]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "value"])
    stream_in = str(tmp_path / "in")
    for s in range(3):
        ev.filter(f"event_id % 3 = {s}").coalesce(1).write.mode("append").parquet(
            stream_in
        )
    final = maintain_agg_stream(
        read_event_stream(spark, stream_in, max_files_per_trigger=1),
        state_dir=str(tmp_path / "state"),
        checkpoint=str(tmp_path / "ckpt"),
        keys=["user_id"],
        sum_cols=["value"],
        minmax_cols=["value"],
    )
    got = _norm(spark.read.parquet(final))
    want = _norm(agg_state(ev, ["user_id"], ["value"], ["value"]))
    assert got.equals(want)
    # one state version per micro-batch, and the final pointer is the last
    versions = sorted(os.listdir(str(tmp_path / "state")))
    assert final.endswith(versions[-1]) and len(versions) >= 2


def test_partitioned_stream_state_equals_batch(spark, tmp_path):
    import os

    from rabitq_spark.streaming.matview_stream import (
        maintain_agg_stream_partitioned,
        read_event_stream,
    )

    rows = [(i, i % 11, float(i) / 7.0) for i in range(300)]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "value"])
    stream_in = str(tmp_path / "in")
    for s in range(3):
        ev.filter(f"event_id % 3 = {s}").coalesce(1).write.mode("append").parquet(
            stream_in
        )
    state = maintain_agg_stream_partitioned(
        read_event_stream(spark, stream_in, max_files_per_trigger=1),
        state_dir=str(tmp_path / "state"),
        checkpoint=str(tmp_path / "ckpt"),
        keys=["user_id"],
        sum_cols=["value"],
        minmax_cols=["value"],
        n_buckets=8,
    )
    got = _norm(spark.read.parquet(state).drop("__bucket"))
    want = _norm(agg_state(ev, ["user_id"], ["value"], ["value"]))
    assert got.equals(want)
    # the state is ONE bucket-partitioned table, not a version chain
    assert any(d.startswith("__bucket=") for d in os.listdir(str(tmp_path / "state")))


def test_partitioned_overwrite_preserves_untouched_buckets(spark, tmp_path):
    from rabitq_spark.streaming.matview_stream import (
        maintain_agg_stream_partitioned,
        read_event_stream,
    )

    base_rows = [(i, i % 11, 1.0) for i in range(110)]
    extra = [(1000 + i, 5, 10.0) for i in range(4)]  # delta touches ONE user
    ev = spark.createDataFrame(base_rows, ["event_id", "user_id", "value"])
    ex = spark.createDataFrame(extra, ["event_id", "user_id", "value"])
    stream_in = str(tmp_path / "in2")
    ev.coalesce(1).write.mode("append").parquet(stream_in)
    ex.coalesce(1).write.mode("append").parquet(stream_in)
    state = maintain_agg_stream_partitioned(
        read_event_stream(spark, stream_in, max_files_per_trigger=1),
        state_dir=str(tmp_path / "state2"),
        checkpoint=str(tmp_path / "ckpt2"),
        keys=["user_id"],
        sum_cols=["value"],
        n_buckets=8,
    )
    got = _norm(spark.read.parquet(state).drop("__bucket"))
    want = _norm(
        agg_state(ev.unionByName(ex), ["user_id"], ["value"])
    )
    assert got.equals(want)  # users in untouched buckets kept their state

"""Interval join: binned plan equals naive range join; stream-stream twin
produces the same pairs."""

from pyspark.sql import functions as F

from rabitq_spark.operators.interval import interval_join, interval_join_stream
from rabitq_spark.sources.tables import load_table

W_US = 30 * 60 * 1_000_000


def _sides(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("ts_us").alias("p_ts_us")
    )
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("c_id"), F.col("ts_us").alias("c_ts_us")
    )
    return purchases, clicks


def test_binned_equals_naive(spark, sf_dir):
    purchases, clicks = _sides(spark, sf_dir)
    binned = {
        (r.p_id, r.c_id)
        for r in interval_join(
            purchases, clicks, "user_id", "p_ts_us", "c_ts_us", W_US
        ).collect()
    }
    naive = {
        (r.p_id, r.c_id)
        for r in purchases.join(clicks, "user_id")
        .filter(
            (F.col("c_ts_us") <= F.col("p_ts_us"))
            & (F.col("c_ts_us") >= F.col("p_ts_us") - W_US)
        )
        .collect()
    }
    assert binned == naive and len(binned) > 0


def test_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "ev_int")
    raw.repartition(4).write.parquet(src)

    from rabitq_spark.streaming.pipeline import read_events_stream

    ev = read_events_stream(spark, src)
    l = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("l_user_id"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("l_ts"),
    )
    r = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("r_user_id"),
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("r_ts"),
    )
    joined = interval_join_stream(l, r, "user_id", "30 minutes", "2 hours")
    q = (
        joined.select("p_id", "c_id")
        .writeStream.format("memory")
        .queryName("int_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.p_id, r.c_id) for r in spark.sql("SELECT * FROM int_join").collect()
    }
    purchases, clicks = _sides(spark, sf_dir)
    want = {
        (r.p_id, r.c_id)
        for r in interval_join(
            purchases, clicks, "user_id", "p_ts_us", "c_ts_us", W_US
        ).collect()
    }
    assert got == want

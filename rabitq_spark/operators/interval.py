"""Interval (range) join: pair events within a time window per key.

Naive formulations (`l.ts BETWEEN r.ts - W AND r.ts`) force a broadcast
nested-loop or an O(n·m) sort-merge range scan. The scale-correct plan bins
time into window-sized buckets and equi-joins on (key, bucket) for the
candidate generation — each left row needs only its own bucket and the next
one (any right row within W is in one of the two) — then applies the exact
range predicate. Shuffle is keyed by (key, bucket): bounded fan-out,
AQE-splittable, no quadratic blowup.

The streaming twin is a watermarked stream-stream join with the same range
condition (Structured Streaming's interval join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts_us: str,
    right_ts_us: str,
    window_us: int,
) -> DataFrame:
    """Pairs (left, right) with same `on` key and
    left.ts − window_us <= right.ts <= left.ts  (right precedes left by at
    most the window). Returns all left columns + right columns; right
    columns must not collide with left's (rename beforehand).
    """
    lb = left.withColumn("__bkt", (F.col(left_ts_us) / window_us).cast("bigint"))
    # each left bucket b can match right rows in buckets b and b-1
    rb = right.withColumn(
        "__bkt0", (F.col(right_ts_us) / window_us).cast("bigint")
    ).withColumn("__bkt", F.explode(F.array(F.col("__bkt0"), F.col("__bkt0") + 1)))
    joined = lb.join(rb, [on, "__bkt"]).filter(
        (F.col(right_ts_us) <= F.col(left_ts_us))
        & (F.col(right_ts_us) >= F.col(left_ts_us) - window_us)
    )
    return joined.drop("__bkt", "__bkt0")


def interval_join_stream(
    left_stream: DataFrame,
    right_stream: DataFrame,
    on: str,
    window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join with watermarks bounding both sides'
    state (Structured Streaming joins require them to expire buffered rows).
    Expects ts TIMESTAMP columns named l_ts / r_ts."""
    l = left_stream.withWatermark("l_ts", watermark)
    r = right_stream.withWatermark("r_ts", watermark)
    return l.join(
        r,
        F.expr(
            f"l_{on} = r_{on} AND r_ts >= l_ts - INTERVAL {window} AND r_ts <= l_ts"
        ),
    )

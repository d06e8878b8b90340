"""Time-series regularization: resample an event stream onto a fixed grid
with gap rows, and carry observations forward (LOCF) — the preprocessing
every per-entity monitoring/feature pipeline runs before windowed models
(a gap is information; a missing row is a bug).

Plan shape: the hourly aggregate is one keyed shuffle; per-entity grids
come from `sequence()` + explode (rows = Σ_entity span-hours, generated
executor-side, never collected); the gap join is keyed by (entity, bucket);
LOCF is one ordered window per entity. Nothing driver-side, nothing
quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resample_locf(
    events: DataFrame,
    bucket_us: int = 3_600_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
) -> DataFrame:
    """Per-entity fixed-grid resample with LOCF:

    (user_id, bucket_idx, n_events, sum_value, locf_value)

    - the grid spans each entity's [first, last] observed bucket with NO
      holes (gap buckets appear with n_events = 0, sum_value NULL)
    - locf_value carries the last observed bucket sum forward across gaps
      (DECIMAL-exact sums cast to double, so the carried value is
      bit-portable)
    """
    from pyspark.sql import Window

    hourly = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.expr(f"{ts_col} DIV {bucket_us}").alias("bucket_idx"),
            F.col(value_col).alias("v"),
        )
        .groupBy("user_id", "bucket_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("v").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("bucket_idx").alias("lo"), F.max("bucket_idx").alias("hi")
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("bucket_idx")
    )
    joined = grid.join(hourly, ["user_id", "bucket_idx"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "bucket_idx",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "sum_value",
        F.last("sum_value", ignorenulls=True).over(w).alias("locf_value"),
    )


def ewma_by_entity(
    events: DataFrame,
    alpha: float = 0.25,
    entity_col: str = "user_id",
    ts_col: str = "ts_us",
    order_tiebreak: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-entity exponentially-weighted moving average, the time-decayed
    smoother monitoring pipelines keep per user/host/partition-key:

        s_0 = v_0;   s_i = alpha * v_i + (1 - alpha) * s_{i-1}

    computed as an ORDERED left-to-right fold over each entity's event
    sequence (sort_array over (ts, tiebreak, value) structs, then
    F.aggregate seeded with the first value) — with a dyadic alpha the
    float chain is a fixed sequence of IEEE ops, bit-reproducible across
    engines (DuckDB mirror: array_agg(ORDER BY) + list_reduce, which seeds
    from the first element the same way). One keyed shuffle; per-entity
    state is one double — at 100 TB this is the groupBy-collect shape only
    for BOUNDED per-entity event counts; unbounded entities belong on the
    streaming twin (applyInPandasWithState) instead.

    Output: (entity, n_events, last_value, ewma).
    """
    seq = events.groupBy(F.col(entity_col).alias("entity")).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(order_tiebreak).alias("tb"),
                    F.col(value_col).cast("double").alias("v"),
                )
            )
        ).alias("seq")
    )
    a = F.lit(float(alpha))
    first = F.element_at("seq", 1)["v"]
    rest = F.when(
        F.size("seq") > 1, F.slice("seq", 2, F.size("seq") - 1)
    ).otherwise(F.array().cast("array<struct<t:bigint,tb:bigint,v:double>>"))
    return seq.select(
        "entity",
        F.size("seq").cast("bigint").alias("n_events"),
        F.element_at("seq", F.size("seq"))["v"].alias("last_value"),
        F.aggregate(
            rest,
            first,
            lambda acc, x: a * x["v"] + (F.lit(1.0) - a) * acc,
        ).alias("ewma"),
    )

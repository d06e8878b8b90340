"""Event-time analytics over the events table: tumbling windows, session
windows, JSON property extraction. These are the batch twins of the
streaming pipeline in rabitq_spark/streaming (same logical plans; Structured
Streaming adds watermarks/state, Catalyst shares the operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Per (window, event_type): count + exact value sum.

    F.window is the same operator Structured Streaming uses; on batch input
    it is a plain projection + hash aggregate (one shuffle on the group key).
    """
    return (
        events.groupBy(
            F.window(F.col(ts_col), window).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap
    from the previous event of the same user is > gap (strictly).

    Expressed with lag + running sum (one shuffle on user, one sort) —
    the classic formulation every engine optimizes well, and exactly
    mirrorable in oracle SQL. (F.session_window exists, but its merge
    semantics are engine-specific; this formulation is portable.)
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_sec = gap_minutes * 60
    flagged = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col("value"),
        F.when(
            F.col(ts_col).cast("double")
            - F.lag(F.col(ts_col)).over(w).cast("double")
            > gap_sec,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn("session_seq", F.sum("new_session").over(w2))
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .drop("session_seq")
    )


def funnel_counts(events: DataFrame) -> DataFrame:
    """Per-user signup→click→purchase funnel reached-stage counts, computed
    with conditional aggregation (single shuffle)."""
    per_user = events.groupBy("user_id").agg(
        F.max((F.col("event_type") == "signup").cast("int")).alias("did_signup"),
        F.max((F.col("event_type") == "click").cast("int")).alias("did_click"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("did_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("did_signup").alias("n_signup"),
        F.sum(
            (F.col("did_signup") * F.col("did_click"))
        ).alias("n_signup_click"),
        F.sum(
            F.col("did_signup") * F.col("did_click") * F.col("did_purchase")
        ).alias("n_full_funnel"),
    )

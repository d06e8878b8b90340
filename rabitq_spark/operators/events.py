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


def funnel_ordered(
    events: DataFrame,
    stages: tuple[str, ...] = ("signup", "click", "purchase"),
    ts_col: str = "ts_us",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """ORDER-SENSITIVE funnel (MATCH_RECOGNIZE-lite): stage k counts only
    if it occurs AFTER stage k-1 was reached — a click before the signup
    does not advance the funnel (funnel_counts, by contrast, only asks
    "did each event ever happen"). Per user, the reached stage 0..len(stages).

    Execution: one shuffle keyed by user builds the time-ordered event-type
    sequence (ties broken by type string, mirrored in the oracle); the
    pattern automaton is a codegen fold over that array — events map to
    stage codes, the accumulator advances on exactly code == acc+1. No
    per-event joins, no window cascades: sequence-pattern matching as a
    single aggregate."""
    seq = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et")))
        ),
        lambda x: x["et"],
    )
    coded = F.transform(seq, lambda x: _stage_code(x, stages))
    return (
        events.groupBy(F.col(user_col).alias("user_id"))
        .agg(
            F.aggregate(
                coded,
                F.lit(0),
                lambda acc, x: F.when(x == acc + 1, acc + 1).otherwise(acc),
            ).alias("stage")
        )
    )


def _stage_code(x, stages: tuple[str, ...]):
    out = None
    for i, s in enumerate(stages):
        clause = F.when(x == s, F.lit(i + 1))
        out = clause if out is None else out.when(x == s, F.lit(i + 1))
    return out.otherwise(F.lit(0))

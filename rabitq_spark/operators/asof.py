"""As-of (point-in-time) join — a training-data / event-pipeline staple the
reference lacks (extension beyond SURVEY.md §2.5; Spark has no native ASOF).

Implemented as the scalable union-sort-window composition rather than a
range self-join: tag both sides, union, sort within key by (ts, side), and
carry the most recent right-side payload forward with last(ignorenulls).
One shuffle on the join key, one sort — no range-join explosion, no
per-row Python. Skewed keys are split by AQE; at 100 TB this is the same
plan you would hand-write in any MPP engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    tie_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.ts <= left.ts and equal `on` key (backward as-of, inclusive).

    Output: all left columns + right payload columns prefixed 'asof_'
    (NULL when no prior right row). With equal timestamps the right row is
    considered first (inclusive semantics, matching DuckDB's
    `ON l.ts >= r.ts`); among equal right timestamps the largest `tie_col`
    wins (pass a unique id for determinism).
    """
    left_cols = left.columns
    payload = list(right_payload)
    if tie_col is not None and tie_col not in payload:
        payload.append(tie_col)  # carried internally, dropped on output

    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in payload],
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            l_tag.schema["__lrow"].dataType
        ).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
    )
    unioned = l_tag.unionByName(r_tag)

    order = [F.col("__ts").asc(), F.col("__is_left").asc()]
    if tie_col is not None:
        # among right rows at the same ts, the largest tie_col must sort
        # last so last(ignorenulls) picks it
        order.append(F.when(F.col("__is_left") == 0, F.col(f"__r_{tie_col}")).asc_nulls_first())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__is_left",
        "__lrow",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload
        ],
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left_cols],
        *[F.col(f"asof_{c}") for c in right_payload],
    )

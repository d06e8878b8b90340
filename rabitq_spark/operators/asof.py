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
from pyspark.sql.types import StructField, StructType


def _rrow_type(right: DataFrame, right_ts: str, payload: Sequence[str]) -> StructType:
    """Struct type carrying the matched right row: its ts plus payload.

    The whole row travels as ONE struct under a single last(ignorenulls)
    so the emitted ts and payload always come from the same matched row —
    a NULL payload value in the matched row stays NULL (pandas merge_asof
    semantics) instead of falling back to an older row's value."""
    return StructType(
        [StructField("__rts", right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in payload]
    )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    tie_col: str | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.ts <= left.ts and equal `on` key (backward as-of, inclusive).

    Output: all left columns + right payload columns prefixed 'asof_'
    (NULL when no prior right row). With equal timestamps the right row is
    considered first (inclusive semantics, matching DuckDB's
    `ON l.ts >= r.ts`); among equal right timestamps the largest `tie_col`
    wins (pass a unique id for determinism). `tolerance` (same units as
    the ts columns — the pandas merge_asof(tolerance=...) contract) nulls
    the payload when the matched row is older than left_ts − tolerance;
    the match is bounded, not re-searched, which keeps the one-shuffle
    union-sort-window plan unchanged.
    """
    left_cols = left.columns
    payload = list(right_payload)
    if tie_col is not None and tie_col not in payload:
        payload.append(tie_col)  # carried internally, dropped on output

    rrow_t = _rrow_type(right, right_ts, payload)
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__lrow"),
        F.lit(None).cast(rrow_t).alias("__rrow"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            l_tag.schema["__lrow"].dataType
        ).alias("__lrow"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c) for c in payload],
        ).alias("__rrow"),
    )
    unioned = l_tag.unionByName(r_tag)

    order = [F.col("__ts").asc(), F.col("__is_left").asc()]
    if tie_col is not None:
        # among right rows at the same ts, the largest tie_col must sort
        # last so last(ignorenulls) picks it (left rows: NULL struct field)
        order.append(F.col("__rrow").getField(tie_col).asc_nulls_first())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__is_left",
        "__ts",
        "__lrow",
        # ONE last() over the whole right-row struct: ts and payload are
        # inseparable, so a matched row's NULL payload stays NULL
        F.last(F.col("__rrow"), ignorenulls=True).over(w).alias("__m"),
    )
    lefts = carried.filter(F.col("__is_left") == 1)
    if tolerance is None:
        out_payload = [
            F.col("__m").getField(c).alias(f"asof_{c}") for c in right_payload
        ]
    else:
        within = F.col("__m").isNotNull() & (
            (F.col("__ts") - F.col("__m").getField("__rts"))
            <= F.lit(int(tolerance))
        )
        out_payload = [
            F.when(within, F.col("__m").getField(c)).alias(f"asof_{c}")
            for c in right_payload
        ]
    return lefts.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left_cols],
        *out_payload,
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    tie_col: str | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, attach the EARLIEST right row with
    right.ts >= left.ts and equal `on` key (forward as-of, inclusive) —
    "what happened next": next click after a purchase, next error after a
    deploy. Same union-sort-window plan as backward, ordered descending;
    among equal right timestamps the SMALLEST `tie_col` wins (the first
    row in forward direction). `tolerance` nulls the payload when the
    match is later than left_ts + tolerance (pandas merge_asof)."""
    left_cols = left.columns
    payload = list(right_payload)
    if tie_col is not None and tie_col not in payload:
        payload.append(tie_col)

    rrow_t = _rrow_type(right, right_ts, payload)
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__lrow"),
        F.lit(None).cast(rrow_t).alias("__rrow"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c) for c in payload],
        ).alias("__rrow"),
    )
    unioned = l_tag.unionByName(r_tag)

    # descending time: walking the window forward means walking time
    # backward, so last(ignorenulls) carries the earliest right row at or
    # after the left row; right sorts before left at equal ts (inclusive)
    order = [F.col("__ts").desc(), F.col("__is_left").asc()]
    if tie_col is not None:
        order.append(F.col("__rrow").getField(tie_col).desc_nulls_first())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__is_left",
        "__ts",
        "__lrow",
        F.last(F.col("__rrow"), ignorenulls=True).over(w).alias("__m"),
    )
    lefts = carried.filter(F.col("__is_left") == 1)
    if tolerance is None:
        out_payload = [
            F.col("__m").getField(c).alias(f"asof_{c}") for c in right_payload
        ]
    else:
        within = F.col("__m").isNotNull() & (
            (F.col("__m").getField("__rts") - F.col("__ts"))
            <= F.lit(int(tolerance))
        )
        out_payload = [
            F.when(within, F.col("__m").getField(c)).alias(f"asof_{c}")
            for c in right_payload
        ]
    return lefts.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left_cols],
        *out_payload,
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    tie_col: str | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, the right row with MINIMAL |right.ts − left.ts|
    (equal distance → the backward match wins). Composition of backward +
    forward — two window passes, still one shuffle key, no range join.
    `left_ts`/`right_ts` must be numeric (epoch micros) so the distance is
    well-defined. `tolerance` nulls the payload when even the nearest
    match is farther than `tolerance` (pandas merge_asof contract — the
    bound applies AFTER choosing the minimum, which equals bounding the
    search on both sides)."""
    if not right_payload:
        raise ValueError("asof_join_nearest needs right_payload")
    back = asof_join_backward(
        left, right, on, left_ts, right_ts,
        right_payload=(right_ts, *right_payload), tie_col=tie_col,
    )
    fwd_in = back.withColumnRenamed(f"asof_{right_ts}", "__b_ts")
    for c in right_payload:
        fwd_in = fwd_in.withColumnRenamed(f"asof_{c}", f"__b_{c}")
    fwd = asof_join_forward(
        fwd_in, right, on, left_ts, right_ts,
        right_payload=(right_ts, *right_payload), tie_col=tie_col,
    )
    out = fwd.withColumnRenamed(f"asof_{right_ts}", "__f_ts")
    for c in right_payload:
        out = out.withColumnRenamed(f"asof_{c}", f"__f_{c}")
    d_b = F.abs(F.col(left_ts) - F.col("__b_ts"))
    d_f = F.abs(F.col(left_ts) - F.col("__f_ts"))
    take_back = F.col("__f_ts").isNull() | (
        F.col("__b_ts").isNotNull() & (d_b <= d_f)
    )
    chosen = [
        F.when(take_back, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}"))
        for c in right_payload
    ]
    if tolerance is not None:
        chosen_d = F.when(take_back, d_b).otherwise(d_f)
        chosen = [
            F.when(chosen_d <= F.lit(int(tolerance)), e) for e in chosen
        ]
    return out.select(
        *[F.col(c) for c in left.columns],
        *[e.alias(f"asof_{c}") for e, c in zip(chosen, right_payload)],
    )

"""Incremental materialized-view maintenance: refresh an aggregate state
from a delta batch without rescanning history.

A 100 TB corpus is append-mostly: per-key aggregates (documents per source,
revenue per customer, token counts per shard) should absorb a day's delta by
aggregating the DELTA ONLY and merging it into yesterday's state — never by
recomputing over the full history. The algebra is the standard one for
self-maintainable aggregates: COUNT and SUM merge by addition, MIN/MAX by
least/greatest (insert-only), and AVG is derived from (SUM, COUNT) at read
time. Retractions merge the same way: negate a delta state's counts and sums
(MIN/MAX are insert-only self-maintainable — refresh those keys on delete).

Float discipline: sums are carried in DECIMAL(38, s), so state + delta
addition is exact and associative — the merged state is bit-identical to a
full recompute regardless of how many increments it took (the oracle-checked
invariant in queries.py::q_incremental_agg).

Scale shape: the delta aggregate shuffles only delta rows; the merge is one
full-outer join on the group key. With the state table bucketed on the key
(sources/tables.py::write_bucketed) the merge is exchange-free on the state
side, so cost is O(|delta| + touched partitions), not O(|state|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: columns an AggSpec produces per value column
_SUM_T = "decimal(38,4)"


def agg_state(
    rows: DataFrame,
    keys: list[str],
    sum_cols: list[str] | None = None,
    minmax_cols: list[str] | None = None,
    count_col: str = "cnt",
) -> DataFrame:
    """Aggregate `rows` into a mergeable state: per-key COUNT, exact DECIMAL
    SUM per `sum_cols` entry (emitted as `sum_<c>`), and MIN/MAX per
    `minmax_cols` entry (`min_<c>` / `max_<c>`)."""
    sum_cols = sum_cols or []
    minmax_cols = minmax_cols or []
    aggs = [F.count(F.lit(1)).alias(count_col)]
    for c in sum_cols:
        aggs.append(F.sum(F.col(c).cast(_SUM_T)).alias(f"sum_{c}"))
    for c in minmax_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return rows.groupBy(*keys).agg(*aggs)


def merge_agg_state(
    state: DataFrame,
    delta_state: DataFrame,
    keys: list[str],
    sum_cols: list[str] | None = None,
    minmax_cols: list[str] | None = None,
    count_col: str = "cnt",
) -> DataFrame:
    """Merge two agg states (same schema, from `agg_state`) into one.

    COUNT/SUM add (DECIMAL addition — exact, associative); MIN/MAX combine
    with least/greatest. Keys present on only one side pass through. Rows
    whose merged count reaches 0 (full retraction) are dropped.
    """
    sum_cols = sum_cols or []
    minmax_cols = minmax_cols or []
    s = state.select(
        *[F.col(k) for k in keys],
        F.struct(
            F.col(count_col).alias(count_col),
            *[F.col(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
            *[
                x
                for c in minmax_cols
                for x in (
                    F.col(f"min_{c}").alias(f"min_{c}"),
                    F.col(f"max_{c}").alias(f"max_{c}"),
                )
            ],
        ).alias("__s"),
    )
    d = delta_state.select(
        *[F.col(k) for k in keys],
        F.struct(
            F.col(count_col).alias(count_col),
            *[F.col(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
            *[
                x
                for c in minmax_cols
                for x in (
                    F.col(f"min_{c}").alias(f"min_{c}"),
                    F.col(f"max_{c}").alias(f"max_{c}"),
                )
            ],
        ).alias("__d"),
    )
    j = s.join(d, keys, "full_outer")

    def pick(field: str, combine):
        a, b = F.col(f"__s.{field}"), F.col(f"__d.{field}")
        return (
            F.when(F.col("__s").isNull(), b)
            .when(F.col("__d").isNull(), a)
            .otherwise(combine(a, b))
            .alias(field)
        )

    out = [F.col(k) for k in keys]
    out.append(pick(count_col, lambda a, b: a + b))
    for c in sum_cols:
        out.append(pick(f"sum_{c}", lambda a, b: a + b))
    for c in minmax_cols:
        out.append(pick(f"min_{c}", F.least))
        out.append(pick(f"max_{c}", F.greatest))
    return j.select(*out).filter(F.col(count_col) != 0)


def incremental_refresh(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str] | None = None,
    minmax_cols: list[str] | None = None,
    count_col: str = "cnt",
) -> DataFrame:
    """One maintenance step: aggregate the delta rows, merge into `state`.

    Equivalent to `agg_state(history ∪ delta)` bit-for-bit, at the cost of
    scanning only the delta.
    """
    d = agg_state(delta, keys, sum_cols, minmax_cols, count_col)
    return merge_agg_state(state, d, keys, sum_cols, minmax_cols, count_col)

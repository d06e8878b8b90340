"""Dataset profiling / data-quality audit — the validation pass a 100 TB
ingest runs before anything else touches the data: per-column null counts,
exact distinct cardinalities, numeric ranges, string ranges.

One wide aggregate computes every metric in a single scan (Spark expands
multiple COUNT(DISTINCT) into one expand + two-stage aggregate — still one
pass over the data); the wide row is then unpivoted to the long
(column, metric...) layout reports want. For approximate profiling at
extreme cardinalities swap the exact distinct for the KMV sketch
(functions/sketch.py) — same output contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    max_str) — one row per profiled column. Numeric ranges are DOUBLE,
    string ranges are lexicographic; the inapplicable pair is NULL.
    DECIMAL/timestamp columns profile via their numeric/NULL lanes according
    to their Spark SQL type name."""
    dtypes = dict(df.dtypes)
    cols = columns if columns is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        is_num = dtypes[c] in _NUMERIC
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}"))
        if is_num:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__min_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__max_{c}"))
        if dtypes[c] == "string":
            aggs.append(F.min(F.col(c)).alias(f"__smin_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"__smax_{c}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__smin_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"__smax_{c}"))
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args.extend(
            [
                F.lit(c),
                F.col(f"__nulls_{c}"),
                F.col(f"__dist_{c}"),
                F.col(f"__min_{c}"),
                F.col(f"__max_{c}"),
                F.col(f"__smin_{c}"),
                F.col(f"__smax_{c}"),
            ]
        )
    return (
        wide.select(
            F.col("__n").alias("n_rows"),
            F.stack(F.lit(len(cols)), *stack_args).alias(
                "column", "n_nulls", "n_distinct", "min_num", "max_num",
                "min_str", "max_str",
            ),
        ).select(
            "column", "n_rows", "n_nulls", "n_distinct",
            "min_num", "max_num", "min_str", "max_str",
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Per-group winsorization: clip values to the exact [p_lo, p_hi]
    order-statistic fences (k-th smallest, k = ceil(q·n) — the same
    engine-portable discrete-percentile rule as value_percentiles; no
    interpolation, so the fences are values that actually occur and the
    clip is bit-exact across engines).

    The training-data use: tame heavy-tailed numeric features (token
    counts, scores, durations) before they feed normalization or mixing
    weights. Plan: one ranked window per group (shuffle keyed by group),
    fences reduce to one row per group and broadcast back onto a second
    scan — the corpus itself shuffles once.
    """
    from pyspark.sql import Window

    ranked = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).alias("__v"),
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(F.col(value_col), F.col(id_col))
        ).alias("__rk"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("__n"),
    )
    fences = ranked.groupBy("__g").agg(
        F.min(
            F.when(
                F.col("__rk") == F.ceil(F.lit(lo_q) * F.col("__n")).cast("bigint"),
                F.col("__v"),
            )
        ).alias("__lo"),
        F.min(
            F.when(
                F.col("__rk") == F.ceil(F.lit(hi_q) * F.col("__n")).cast("bigint"),
                F.col("__v"),
            )
        ).alias("__hi"),
    )
    return (
        df.join(
            F.broadcast(fences), F.col(group_col) == F.col("__g")
        )
        .select(
            *df.columns,
            F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")).alias(
                f"{value_col}_winsorized"
            ),
        )
    )

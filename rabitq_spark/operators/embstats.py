"""Embedding-column statistics — the drift/health monitor an embedding
pipeline runs per batch: per-group element-wise mean vector, per-dimension
variance, and norm statistics. A production corpus re-embeds continuously;
comparing today's per-source mean vector and per-dim variance against
yesterday's catches encoder regressions and ingest bugs before they poison
an index (the same role profile_table plays for scalar columns).

Float discipline: per-dimension sums are exact DECIMAL (associative,
partition-proof); mean and variance then come from single IEEE divisions /
multiplies, so every output double is bit-reproducible and oracle-checkable
(embedding_stats). Variance uses the E[x²]−E[x]² form on exact sums — no
two-pass dependence, one shuffle keyed by (group, dim).

The double→DECIMAL cast is the one cross-engine trap here: engines round
fractional decimals with different tie rules (measured: 1 cell in 640
diverged at scale 10 — Spark HALF_UP vs DuckDB). The fix is to make the
cast EXACT: terms are floor-scaled to integers at a power of two
(x·2^49, x²·2^46) before the cast — floor is deterministic on both engines,
integer doubles convert to DECIMAL without rounding, DECIMAL sums are
exact, and DECIMAL→double is IEEE round-to-nearest-even everywhere. The
floor quantizes each term to a ≤ 2^-46 grid step (bias < 1e-13 — nothing
for a drift monitor) and the scales keep Spark's BIGINT floor output in
range for |x| up to ~100.

Scale shape: posexplode fans each vector to dim rows once; the aggregate is
keyed by (group, dim) — width × groups cells, embarrassingly parallel, no
driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: power-of-two floor scales (exact-integer doubles, BIGINT-safe to |x|~100)
P_S = float(1 << 49)   # x · 2^49
P_SS = float(1 << 46)  # x² · 2^46


def embedding_stats(
    emb: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(group, dim, n, mean_val, var_val) per group × dimension.

    mean = (S/2^49)/n, var = (SS/2^46)/n − mean² with S and SS exact
    integer-DECIMAL sums of floor-scaled terms — both engines perform
    identical IEEE ops on identical exact inputs (module docstring).
    """
    cells = emb.select(
        F.col(group_col).alias("group"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    ).select("group", "dim", F.col("x").cast("double").alias("x"))
    agg = cells.groupBy("group", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("x") * P_S).cast("decimal(38,0)"))
        .cast("double")
        .alias("__s"),
        F.sum(F.floor(F.col("x") * F.col("x") * P_SS).cast("decimal(38,0)"))
        .cast("double")
        .alias("__ss"),
    )
    mean = (F.col("__s") / P_S) / F.col("n")
    return agg.select(
        "group",
        "dim",
        "n",
        mean.alias("mean_val"),
        ((F.col("__ss") / P_SS) / F.col("n") - mean * mean).alias("var_val"),
    )


def embedding_norm_stats(
    emb: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(group, n, mean_norm_sq, min_norm_sq, max_norm_sq) — the cheap
    whole-vector health signal (collapsed norms flag dead encoders).
    Norm² per row is a left-to-right fold; the group mean is an exact
    DECIMAL sum divided once."""
    norm_sq = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double"),
    )
    rows = emb.select(F.col(group_col).alias("group"), norm_sq.alias("__nsq"))
    return rows.groupBy("group").agg(
        F.count(F.lit(1)).alias("n"),
        # same floor-scaled exact-integer sum as embedding_stats, so the
        # mean is engine-portable (oracle embedding_norms)
        (
            (
                F.sum(F.floor(F.col("__nsq") * P_SS).cast("decimal(38,0)"))
                .cast("double")
                / P_SS
            )
            / F.count(F.lit(1))
        ).alias("mean_norm_sq"),
        F.min("__nsq").alias("min_norm_sq"),
        F.max("__nsq").alias("max_norm_sq"),
    )

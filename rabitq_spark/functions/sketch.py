"""KMV (k-minimum-values) distinct-count sketch — a mergeable cardinality
sketch whose entire computation is deterministic (md5 order statistics), so
unlike HLL implementations the ESTIMATE itself is reproducible across
engines and partitionings and can be oracle-checked bit-for-bit.

Estimator: hash every value to U(0,1) (here: first 15 md5 hex chars /
16^15); keep the k smallest hashes per group; estimate = (k-1) / kth_min.
Standard error ≈ 1/sqrt(k-2). Distributed shape: one groupBy with a
collect-sorted-truncate aggregate — the per-group state is k doubles, and
sketches merge by union+truncate (the same property HLL offers).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DENOM = float(16**15)


def kmv_hash(value: Column | str) -> Column:
    """Deterministic U(0,1) hash of a value (md5-based, engine-portable)."""
    v = F.col(value) if isinstance(value, str) else value
    return (
        F.conv(F.substring(F.md5(v.cast("string")), 1, 15), 16, 10).cast("double")
        / F.lit(_DENOM)
    )


def kmv_distinct(df, group_cols: list[str], value_col: str, k: int = 64):
    """Per-group KMV distinct-count estimate: (group_cols..., est_distinct).

    Scale-bounded plan: distinct (group, hash) pairs → k smallest hashes per
    group via a ranked window (WindowGroupLimit keeps ≤ k rows per partition
    BEFORE the shuffle, so state never exceeds k × partitions per group) →
    one tiny aggregate computing (k-1)/kth_min, exact below k distincts.
    """
    from rabitq_spark.operators.topk import topk_per_group

    hashed = df.select(*group_cols, kmv_hash(value_col).alias("__h")).distinct()
    smallest = topk_per_group(
        hashed, group_cols, [F.col("__h").asc()], k, rank_col="__rk"
    )
    per_group = smallest.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"), F.max("__h").alias("__kth")
    )
    est = F.when(
        F.col("__n") < k, F.col("__n").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("__kth"))
    return per_group.select(*group_cols, est.alias("est_distinct"))

"""Z-order (Morton-curve) data layout for multi-column scan pruning.

At 100 TB, which rows share a Parquet file decides how much a filtered scan
reads: min/max row-group statistics prune only if rows with similar values
are physically adjacent. Sorting clusters ONE column; Z-ORDERING interleaves
the bits of several columns' ranks so a file covers a small hyper-rectangle
of the value space — a range predicate on ANY of the z-columns prunes most
files (the Delta/Iceberg OPTIMIZE ZORDER BY feature, engine-level).

Plan shape (all shuffles bounded):
  1. per column: rank via the DISTINCT-VALUE cumulative histogram — one
     groupBy(value) per column plus a window over distinct values only
     (same partition-independence trick as curate.quality_filter_quantile;
     never a global row-number over the corpus);
  2. map ranks to 2^bits buckets, interleave bits into the Morton code
     (pure integer codegen — bit-exact, oracle-checkable);
  3. repartitionByRange(zvalue) + sortWithinPartitions for the writer.

Ties share a bucket (value-deterministic), so the emitted codes are a pure
function of the DATA — independent of partitioning, ordering, or cluster
layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _bucket_col(df: DataFrame, col: str, bits: int) -> DataFrame:
    """(value → bucket) map for one column: bucket = floor(cum_before/N ·
    2^bits), cum_before = rows with a strictly smaller value. Monotone in
    the value, balanced for distinct-heavy columns, and every tie lands in
    one bucket.

    The cumulative sum is a TWO-LEVEL range-partitioned prefix scan
    (round-4 verdict: a global Window.orderBy over the distinct-value
    histogram ran in ONE task — for distinct-heavy columns the histogram
    is corpus-sized). Level 1: range-partition the histogram by value and
    cum-sum WITHIN each partition (parallel, corpus-scale). Level 2: a
    window over the per-partition totals — n_parts rows, bounded by
    cluster parallelism, never by data. cum_before = local + partition
    offset is exact regardless of where the range boundaries fall, so the
    output stays a pure function of the data (bit-equal to the old global
    window; the zorder_events oracle still hash-matches)."""
    hist = df.groupBy(F.col(col).alias("__v")).agg(F.count(F.lit(1)).alias("__c"))
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    # lazy localCheckpoint: both the local-scan and the totals branch read
    # the SAME materialized range layout (one shuffle, no recompute drift)
    ranged = (
        hist.repartitionByRange(n_parts, "__v")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.select(
        "__v",
        "__pid",
        F.coalesce(F.sum("__c").over(w_local), F.lit(0)).alias("__local"),
    )
    totals = ranged.groupBy("__pid").agg(F.sum("__c").alias("__t"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid", F.coalesce(F.sum("__t").over(w_off), F.lit(0)).alias("__off")
    )
    return local.join(F.broadcast(offsets), "__pid").select(
        "__v", (F.col("__local") + F.col("__off")).alias("__cum_before")
    )


def zorder_code(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
) -> DataFrame:
    """Append `zvalue` (the Morton interleave of the columns' rank buckets)
    plus per-column `__bucket_<col>` debug columns. Deterministic pure
    function of the data; 64-bit output requires len(cols)·bits <= 63."""
    if len(cols) * bits > 63:
        raise ValueError("len(cols) * bits must fit a signed 64-bit zvalue")
    tot = df.agg(F.count(F.lit(1)).alias("__n"))
    out = df.crossJoin(F.broadcast(tot))
    levels = 1 << bits
    for c in cols:
        bmap = _bucket_col(df, c, bits)
        out = out.join(
            F.broadcast(bmap.withColumnRenamed("__v", c)), c, "left"
        ).withColumn(
            f"__bucket_{c}",
            F.least(
                F.floor(
                    F.col("__cum_before")
                    * F.lit(float(levels))
                    / F.col("__n").cast("double")
                ),
                F.lit(levels - 1),
            ).cast("bigint"),
        ).drop("__cum_before")
    z = None
    for i, c in enumerate(cols):
        for b in range(bits):
            term = F.shiftleft(
                F.shiftright(F.col(f"__bucket_{c}"), b).bitwiseAND(F.lit(1)),
                b * len(cols) + i,
            )
            z = term if z is None else z + term
    return out.withColumn("zvalue", z.cast("bigint")).drop("__n")


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    n_files: int = 32,
) -> DataFrame:
    """The write-side layout: z-code, range-partition into `n_files` splits
    of the Morton curve, sort within each — ready for .write.parquet(), after
    which min/max stats prune range predicates on any z-column."""
    coded = zorder_code(df, cols, bits)
    keep = [c for c in coded.columns if not c.startswith("__bucket_")]
    return (
        coded.select(*keep)
        .repartitionByRange(n_files, "zvalue")
        .sortWithinPartitions("zvalue")
    )

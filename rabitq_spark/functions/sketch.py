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


# --------------------------------------------------------------------------
# Count-min sketch: bounded-memory frequency estimation


def cms_bucket(value: Column | str, depth_idx: int, width: int) -> Column:
    """Deterministic bucket of `value` for hash row `depth_idx` (md5-based,
    engine-portable like kmv_hash)."""
    v = F.col(value) if isinstance(value, str) else value
    salted = F.concat(v.cast("string"), F.lit(f"#cms{depth_idx}"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 15), 16, 10)
        .cast("bigint") % width
    ).cast("int")


def cms_build_from_counts(
    counts, value_col: str, count_col: str, depth: int = 4, width: int = 512
):
    """cms_build for a PRE-AGGREGATED (value, count) table — lets callers
    that already computed exact counts (top-k reports) derive the sketch
    without a second corpus pass."""
    cells = counts.select(
        F.col(count_col).alias("__c"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth_idx"),
                        cms_bucket(value_col, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    )
    return cells.groupBy("c.depth_idx", "c.bucket").agg(
        F.sum("__c").alias("cnt")
    )


def cms_build(df, value_col: str, depth: int = 4, width: int = 512):
    """Count-min sketch counters over a value column: (depth_idx, bucket,
    cnt), one row per NON-EMPTY counter cell (absent cell = 0).

    The whole sketch is d × w integers regardless of input size — the
    bounded-state substitute for an exact token groupBy when memory, not
    compute, is the constraint (per-shard frequency tables, streaming
    accumulation). Counters MERGE BY ADDITION across shards/batches, the
    same property that makes KMV union-able. Deterministic md5 bucketing →
    the estimate itself is oracle-checkable, unlike seeded-hash CMS libs.

    Plan: aggregate exact per-value counts FIRST (one shuffle keyed by
    value), then hash only the DISTINCT values — d md5s per vocabulary
    entry instead of d per occurrence (the bpe vocabulary trick; measured
    9.1 → ~2 s at sf1.0's 13M tokens) — and fold into (depth_idx, bucket)
    cells with a second, d×w-bounded shuffle.
    """
    counts = df.groupBy(F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    return cms_build_from_counts(counts, "__v", "__c", depth, width)


def cms_estimate(counters, probes, value_col: str, depth: int = 4, width: int = 512):
    """Point estimates for `probes[value_col]`: min over hash rows of the
    matching counter (the classic CMS upper-bound estimate; ≥ true count,
    overestimates only on collisions). Output: probe columns + `cms_est`.

    The probe side fans out d rows per probe and joins the (tiny) counter
    table — broadcast, no shuffle of the probe stream.
    """
    probe_cells = probes.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth_idx"),
                        cms_bucket(value_col, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    ).select("*", F.col("c.depth_idx").alias("depth_idx"), F.col("c.bucket").alias("bucket")).drop("c")
    out_cols = [c for c in probes.columns]
    ctr = counters.withColumnRenamed("cnt", "__ccnt")
    joined = probe_cells.join(F.broadcast(ctr), ["depth_idx", "bucket"], "left")
    return (
        joined.groupBy(*out_cols)
        .agg(F.min(F.coalesce("__ccnt", F.lit(0))).alias("cms_est"))
    )


# --------------------------------------------------------------------------
# Bloom filter: bounded-memory approximate membership


def bloom_positions(value: Column | str, n_hashes: int, n_bits: int) -> Column:
    """Array of `n_hashes` bit positions for `value` (md5-salted, engine-
    portable — same derivation family as cms_bucket/kmv_hash)."""
    v = F.col(value) if isinstance(value, str) else value
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(v.cast("string"), F.lit(f"#bloom{j}"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % n_bits
            ).cast("int")
            for j in range(n_hashes)
        ]
    )


def bloom_build(df, value_col: str, n_hashes: int = 3, n_bits: int = 4096):
    """The set bits of a Bloom filter over a value column: one row per SET
    bit position — at most n_bits rows however large the input. Filters
    merge by UNION (bit-OR); membership via bloom_probe. The md5 bit
    derivation is deterministic, so false positives are REPRODUCIBLE and
    the whole structure oracle-checkable (bloom_decontaminate)."""
    return (
        df.select(F.explode(bloom_positions(value_col, n_hashes, n_bits)).alias("bit"))
        .distinct()
    )


def bloom_probe(
    bits, probes, value_col: str, n_hashes: int = 3, n_bits: int = 4096
):
    """probes + `maybe_member` (true iff every hash bit is set — no false
    negatives, deterministic false positives). The bit table broadcasts
    (≤ n_bits rows); the probe stream never shuffles."""
    out_cols = list(probes.columns)
    cells = probes.select(
        "*", F.explode(bloom_positions(value_col, n_hashes, n_bits)).alias("bit")
    )
    joined = cells.join(
        F.broadcast(bits.withColumn("__set", F.lit(1))), "bit", "left"
    )
    return joined.groupBy(*out_cols).agg(
        (F.count(F.lit(1)) == F.sum(F.coalesce("__set", F.lit(0)))).alias(
            "maybe_member"
        )
    )


def histogram_quantiles(
    df,
    value_col: str,
    group_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    n_bins: int = 256,
):
    """Mergeable histogram-based quantile SKETCH — the 100 TB alternative
    to exact order-statistic percentiles (value_percentiles /
    quality_filter_quantile need a per-group sort or distinct-value window;
    this needs ONE pass to bin counts, and shards merge by adding
    counters, so it composes with incremental/streaming maintenance like
    every sketch in this module).

    Estimate: global [lo, hi] fixed-width bins; quantile q = the UPPER
    EDGE of the first bin where the cumulative count reaches ceil(q·n) —
    a deterministic, engine-portable rule (no interpolation), with error
    bounded by one bin width (hi−lo)/n_bins. All arithmetic is integer
    counts plus one mirrored double expression per edge.

    Returns (group, n, q_0.5, q_0.9, ... as est_p50-style columns).
    """
    from pyspark.sql import Window, functions as F

    lohi = df.agg(
        F.min(F.col(value_col).cast("double")).alias("lo"),
        F.max(F.col(value_col).cast("double")).alias("hi"),
    )
    binned = (
        df.crossJoin(F.broadcast(lohi))
        .select(
            F.col(group_col).alias("grp"),
            "lo",
            "hi",
            F.least(
                F.lit(n_bins - 1),
                F.floor(
                    (F.col(value_col).cast("double") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / F.lit(float(n_bins)))
                ).cast("int"),
            ).alias("bin"),
        )
        .groupBy("grp", "lo", "hi", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("grp")
    cum = binned.select(
        "grp",
        "lo",
        "hi",
        "bin",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )
    edge = F.col("lo") + (F.col("bin") + 1) * ((F.col("hi") - F.col("lo")) / F.lit(float(n_bins)))
    aggs = [F.max("n").alias("n")]
    for q in qs:
        name = f"est_p{str(q).replace('0.', '').ljust(2, '0')}"
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(F.lit(q) * F.col("n")).cast("bigint"),
                    edge,
                )
            ).alias(name)
        )
    return cum.groupBy(F.col("grp").alias(group_col)).agg(*aggs)

"""KMV sketch: exact below k, within expected error above k, deterministic."""

import numpy as np
from pyspark.sql import functions as F

from rabitq_spark.functions.sketch import kmv_distinct


def test_kmv_exact_below_k(spark):
    df = spark.range(0, 40).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    est = kmv_distinct(df, ["g"], "v", k=64).first().est_distinct
    assert est == 40.0  # fewer than k distincts -> exact


def test_kmv_estimate_within_error(spark):
    n = 5000
    df = spark.range(0, n).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )
    k = 256
    rows = kmv_distinct(df, ["g"], "v", k=k).collect()
    for r in rows:
        true = n / 2
        # standard error ~ 1/sqrt(k-2); allow 5 sigma
        assert abs(r.est_distinct - true) / true < 5 / np.sqrt(k - 2), r


def test_kmv_deterministic_across_partitionings(spark):
    df = spark.range(0, 2000).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    a = kmv_distinct(df.repartition(2), ["g"], "v", k=64).first().est_distinct
    b = kmv_distinct(df.repartition(17), ["g"], "v", k=64).first().est_distinct
    assert a == b  # order statistics don't depend on partitioning


def test_cms_upper_bound_and_merge(spark, sf_dir):

    from rabitq_spark.functions.sketch import cms_build, cms_estimate
    from rabitq_spark.functions.text import tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(tokens("text")).alias("token"))
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    counters = cms_build(toks, "token", depth=4, width=256)
    est = cms_estimate(counters, exact, "token", depth=4, width=256).toPandas()
    # CMS guarantee: estimate never undercounts
    assert (est.cms_est >= est.cnt).all()
    # counters merge by addition: sketch(A) + sketch(B) == sketch(A ∪ B)
    half_a = docs.filter("doc_id % 2 = 0").select(
        F.explode(tokens("text")).alias("token")
    )
    half_b = docs.filter("doc_id % 2 = 1").select(
        F.explode(tokens("text")).alias("token")
    )
    merged = (
        cms_build(half_a, "token", depth=4, width=256)
        .unionByName(cms_build(half_b, "token", depth=4, width=256))
        .groupBy("depth_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = counters.toPandas().sort_values(["depth_idx", "bucket"], ignore_index=True)
    m = merged.toPandas().sort_values(["depth_idx", "bucket"], ignore_index=True)
    assert full.astype("int64").equals(m.astype("int64"))


def test_bloom_no_false_negatives_and_merge(spark):

    from rabitq_spark.functions.sketch import bloom_build, bloom_probe

    members = spark.createDataFrame([(i,) for i in range(0, 200, 2)], ["v"])
    others = spark.createDataFrame([(i,) for i in range(1, 200, 2)], ["v"])
    bits = bloom_build(members, "v", n_hashes=3, n_bits=1 << 14)
    allv = members.unionByName(others)
    out = {r["v"]: r["maybe_member"] for r in
           bloom_probe(bits, allv, "v", 3, 1 << 14).collect()}
    # no false negatives, ever
    assert all(out[v] for v in range(0, 200, 2))
    # at 16k bits / 100 members FPs should be rare
    fps = sum(1 for v in range(1, 200, 2) if out[v])
    assert fps <= 5, fps
    # filters merge by union of set bits
    half_a = bloom_build(members.filter("v < 100"), "v", 3, 1 << 14)
    half_b = bloom_build(members.filter("v >= 100"), "v", 3, 1 << 14)
    merged = half_a.unionByName(half_b).distinct()
    assert sorted(r["bit"] for r in merged.collect()) == sorted(
        r["bit"] for r in bits.collect()
    )



def test_histogram_quantiles_error_bound_and_merge(spark):
    """Sketch estimates land within one bin width of the exact quantile,
    and the bins merge additively across shards (same estimate either way)."""
    from pyspark.sql import functions as F

    from rabitq_spark.functions.sketch import histogram_quantiles

    rows = [(i, "g", float(i)) for i in range(1, 1001)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = histogram_quantiles(df, "v", "grp", qs=(0.5, 0.9), n_bins=100).first()
    width = (1000.0 - 1.0) / 100
    # exact p50 = 500, p90 = 900 (k = ceil(q*n)-th smallest)
    assert abs(got["est_p50"] - 500.0) <= width
    assert abs(got["est_p90"] - 900.0) <= width
    # partition-independence (the merge property in action: Spark sums the
    # same counters whatever the shard layout)
    got2 = histogram_quantiles(
        df.repartition(7), "v", "grp", qs=(0.5, 0.9), n_bins=100
    ).first()
    assert got["est_p50"] == got2["est_p50"] and got["est_p90"] == got2["est_p90"]

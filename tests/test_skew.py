"""Salted join must equal the plain join, with the hot key spread across
salt buckets."""

from pyspark.sql import functions as F

from rabitq_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") if False else None
    # skewed fact: 90% of rows share one key
    fact = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dval")
    )
    plain = fact.join(dim, "k").select("k", "payload", "dval")
    salted = salted_join(fact, dim, "k", salt=8).select("k", "payload", "dval")
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b and len(a) > 0


def test_salt_distribution_spreads_hot_key(spark):
    fact = spark.range(0, 1000).select(F.lit(7).alias("k"), F.col("id").alias("p"))
    from rabitq_spark.operators.skew import salted_join as sj
    f = fact.withColumn("__salt", F.pmod(F.xxhash64(*fact.columns), F.lit(8)).cast("int"))
    counts = f.groupBy("__salt").count().collect()
    assert len(counts) == 8  # hot key spread across all buckets
    assert max(r["count"] for r in counts) < 1000 * 0.3

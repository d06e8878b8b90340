"""SimHash-bucket diversity sampling (operators/diversity.py)."""

from pyspark.sql import functions as F


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_sample_bounded_and_exhaustive_per_bucket(spark, sf_dir):
    from rabitq_spark.operators.diversity import embedding_diversity_sample

    out = embedding_diversity_sample(_emb(spark, sf_dir), per_bucket=4)
    per_bucket = (
        out.groupBy("bucket")
        .agg(
            F.sum("pick").alias("picked"),
            F.max("bucket_size").alias("size"),
        )
        .collect()
    )
    assert per_bucket, "no buckets produced"
    for r in per_bucket:
        # every bucket yields exactly min(size, per_bucket) picks
        assert r.picked == min(r.size, 4)


def test_sample_is_partition_independent(spark, sf_dir):
    """Same picks regardless of how the input is partitioned — the pick
    order is md5-keyed, not zipWithIndex/monotonic-id-keyed."""
    from rabitq_spark.operators.diversity import embedding_diversity_sample

    emb = _emb(spark, sf_dir)
    a = {
        r.vec_id
        for r in embedding_diversity_sample(emb).filter("pick = 1").collect()
    }
    b = {
        r.vec_id
        for r in embedding_diversity_sample(emb.repartition(13))
        .filter("pick = 1")
        .collect()
    }
    assert a == b


def test_buckets_separate_opposed_vectors(spark):
    """A vector and its negation land in complementary buckets (all sign
    bits flip), so a diversity sample always covers both."""
    from rabitq_spark.operators.diversity import embedding_diversity_sample

    base = [float(i % 7 - 3) + 0.25 for i in range(64)]
    neg = [-x for x in base]
    df = spark.createDataFrame(
        [(0, base), (1, neg)], "vec_id long, embedding array<float>"
    )
    rows = {r.vec_id: r for r in embedding_diversity_sample(df).collect()}
    assert rows[0].bucket + rows[1].bucket == 63  # complementary 6-bit codes
    assert rows[0].pick == 1 and rows[1].pick == 1

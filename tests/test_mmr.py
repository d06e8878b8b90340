"""MMR diversification: relevance-vs-redundancy greedy semantics."""

from rabitq_spark.operators.mmr import mmr_rerank


def test_mmr_prefers_diverse_over_redundant(spark):
    rows = [
        (1, 10, 0.90, [1.0, 0.0]),
        (1, 11, 0.85, [0.99, 0.10]),  # near-duplicate of 10
        (1, 12, 0.50, [0.0, 1.0]),    # orthogonal, lower relevance
    ]
    df = spark.createDataFrame(
        rows, "query_id long, cand_id long, rel double, vec array<double>"
    )
    got = [
        (r.cand_id, r.rank)
        for r in mmr_rerank(df, k=2, lam=0.7).orderBy("rank").collect()
    ]
    # pick 10 (best rel) then 12 (diverse) — NOT 11 despite higher rel
    assert got == [(10, 1), (12, 2)]


def test_mmr_lambda_one_is_pure_relevance(spark):
    rows = [
        (1, 10, 0.9, [1.0, 0.0]),
        (1, 11, 0.85, [0.99, 0.1]),
        (1, 12, 0.5, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, cand_id long, rel double, vec array<double>"
    )
    got = [
        r.cand_id
        for r in mmr_rerank(df, k=3, lam=1.0).orderBy("rank").collect()
    ]
    assert got == [10, 11, 12]


def test_mmr_partitioning_independent(spark, sf_dir):
    from pyspark.sql import functions as F

    from rabitq_spark.functions.vector import dot

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    b = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("vec"))
    scored = b.crossJoin(F.broadcast(q)).select(
        "query_id", "cand_id", "vec", dot(F.col("qvec"), F.col("vec")).alias("rel")
    ).filter(F.col("cand_id") < 50)
    a = {(r.query_id, r.cand_id, r.rank) for r in mmr_rerank(scored, 5).collect()}
    c = {
        (r.query_id, r.cand_id, r.rank)
        for r in mmr_rerank(scored.repartition(13), 5).collect()
    }
    assert a == c and len(a) == 20

"""SQ8 quantizer family: encode bounds, exhaustive exactness, shortlist
recall at a bounded budget."""

from pyspark.sql import functions as F

from rabitq_spark.index.sq8 import (
    sq8_encode_expr,
    sq8_search,
    sq8_train,
)
from rabitq_spark.operators.knn import knn_exact


def _base_queries(spark, sf_dir, nq=8):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    queries = emb.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return base, queries


def test_sq8_codes_in_range_and_monotone(spark, sf_dir):
    base, _ = _base_queries(spark, sf_dir)
    lo, hi = sq8_train(base, "vec")
    assert len(lo) == len(hi) and all(h >= l for l, h in zip(lo, hi))
    coded = base.select(sq8_encode_expr("vec", lo, hi).alias("code"))
    mn, mx = coded.select(
        F.min(F.array_min("code")), F.max(F.array_max("code"))
    ).first()
    assert 0 <= mn and mx <= 255
    # the bounds are tight: both extremes are hit somewhere in the corpus
    assert mn == 0 and mx == 255


def test_sq8_exhaustive_equals_bruteforce(spark, sf_dir):
    base, queries = _base_queries(spark, sf_dir)
    lo, hi = sq8_train(base, "vec")
    exact = knn_exact(queries, base, 5).toPandas().sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    sq = sq8_search(queries, base, 5, lo, hi, shortlist=10**9).toPandas().sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    assert exact.equals(sq)


def test_sq8_bounded_shortlist_recall(spark, sf_dir):
    base, queries = _base_queries(spark, sf_dir, nq=16)
    lo, hi = sq8_train(base, "vec")
    k = 10
    exact = knn_exact(queries, base, k).toPandas()
    sq = sq8_search(queries, base, k, lo, hi, shortlist=4 * k).toPandas()
    truth = set(zip(exact.query_id, exact.neighbor_id))
    got = set(zip(sq.query_id, sq.neighbor_id))
    recall = len(truth & got) / len(truth)
    # 8-bit codes at 64 dims keep relative rank error tiny; a 4k shortlist
    # should essentially never miss a true top-k neighbor
    assert recall >= 0.95, recall

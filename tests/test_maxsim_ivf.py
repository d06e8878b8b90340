"""Index-accelerated MaxSim: exhaustive two-phase == brute force bit-exact;
bounded budgets keep recall while eliminating the all-pairs token join."""

import pandas as pd
from pyspark.sql import functions as F

from rabitq_spark.config import RaBitQConfig
from rabitq_spark.index import build_index
from rabitq_spark.operators.knn import maxsim_search, maxsim_search_ivf

M = 4  # vectors per multi-vector document
NQ = 5


def _mv(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        F.floor(F.col("vec_id") / M).cast("bigint").alias("doc_id"),
        (F.col("vec_id") % M).cast("int").alias("slot"),
        F.col("vec_id").alias("token_id"),
        "embedding",
    )


def _token_model(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    return build_index(base, RaBitQConfig(n_clusters=8, nprobe=8))


def test_exhaustive_ivf_maxsim_equals_brute(spark, sf_dir):
    mv = _mv(spark, sf_dir)
    queries = mv.filter(F.col("doc_id") < NQ)
    model = _token_model(spark, sf_dir)
    brute = (
        maxsim_search(queries, mv, k=10, n_query_vecs=M)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    got = (
        maxsim_search_ivf(
            queries, mv, model, k=10, n_query_vecs=M,
            nprobe=model.n_clusters, per_token_k=10**6,
        )
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, brute, check_exact=True)


def test_bounded_ivf_maxsim_recall_and_plan(spark, sf_dir):
    """Tight budgets: the candidate join replaces the brute crossJoin (no
    nested-loop join in the plan) and still recovers most of the brute
    top-k — a doc is missed only if NONE of its tokens reach any query
    token's shortlist."""
    mv = _mv(spark, sf_dir)
    queries = mv.filter(F.col("doc_id") < NQ)
    model = _token_model(spark, sf_dir)
    out = maxsim_search_ivf(
        queries, mv, model, k=5, n_query_vecs=M, nprobe=6, per_token_k=16
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    got = out.toPandas()
    brute = maxsim_search(queries, mv, k=5, n_query_vecs=M).toPandas()
    hits = got.merge(brute[["query_id", "doc_id"]], on=["query_id", "doc_id"])
    recall = len(hits) / max(len(brute), 1)
    assert recall >= 0.8, f"bounded maxsim recall {recall}"

"""Exact k-NN: slow (codegen fold) and fast (BLAS) paths agree; results match
a numpy brute force."""

import numpy as np
from pyspark.sql import functions as F

from rabitq_spark.operators.knn import knn_exact, knn_exact_fast


def _load(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    queries = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return base, queries, emb


def test_knn_exact_matches_numpy(spark, sf_dir):
    base, queries, emb = _load(spark, sf_dir)
    got = knn_exact(queries, base, 5).toPandas().sort_values(["query_id", "rank"])

    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].values
    mat = np.vstack(pdf["embedding"].values).astype(np.float64)
    qmask = ids < 5
    for qid, qv in zip(ids[qmask], mat[qmask]):
        d = ((mat - qv) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))[:5]
        mine = got[got.query_id == qid]
        assert mine["neighbor_id"].tolist() == ids[order].tolist()
        np.testing.assert_allclose(mine["dist"].values, d[order], rtol=1e-12)


def test_fast_path_equals_slow_path(spark, sf_dir):
    base, queries, _ = _load(spark, sf_dir)
    slow = knn_exact(queries, base, 7).toPandas().sort_values(["query_id", "rank"])
    fast = knn_exact_fast(queries, base, 7).toPandas().sort_values(["query_id", "rank"])
    assert slow[["query_id", "neighbor_id", "rank"]].values.tolist() == \
        fast[["query_id", "neighbor_id", "rank"]].values.tolist()
    # atol: the GEMM form ||a||²+||b||²-2ab loses ~1e-15 absolute near zero
    np.testing.assert_allclose(
        slow["dist"].values, fast["dist"].values, rtol=1e-9, atol=1e-12
    )


def test_maxsim_hand_computed_and_self_retrieval(spark):
    from rabitq_spark.operators.knn import maxsim_search

    # doc 0 (query): q0=[1,0], q1=[0,1]; doc 1 = identical; doc 2 = orthogonal-ish
    rows = [
        (0, 0, [1.0, 0.0]), (0, 1, [0.0, 1.0]),
        (1, 0, [1.0, 0.0]), (1, 1, [0.0, 1.0]),
        (2, 0, [-1.0, 0.0]), (2, 1, [0.5, -0.5]),
    ]
    mv = spark.createDataFrame(
        rows, "doc_id long, slot int, embedding array<float>"
    )
    out = maxsim_search(
        mv.filter("doc_id = 0"), mv, k=3, n_query_vecs=2
    ).collect()
    by_rank = {r.rank: r for r in out}
    # score(0,0)=score(0,1)=1+1=2 (tie -> doc 0 first); score(0,2)=max(-1,.5)+max(0,-.5)=0.5
    assert (by_rank[1].doc_id, by_rank[1].score) == (0, 2.0)
    assert (by_rank[2].doc_id, by_rank[2].score) == (1, 2.0)
    assert (by_rank[3].doc_id, by_rank[3].score) == (2, 0.5)

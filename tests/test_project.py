"""JL projection: distance preservation (the point of the lemma) and
shortlist recall when used as a kNN prefilter."""

import numpy as np
from pyspark.sql import functions as F

from rabitq_spark.functions.project import jl_project, jl_signs
from rabitq_spark.operators.knn import knn_exact


def test_jl_preserves_pairwise_distances(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(80)
    rows = emb.select(
        "vec_id", "embedding", jl_project("embedding", jl_signs(32, 64)).alias("proj")
    ).collect()
    orig = np.array([r["embedding"] for r in rows], dtype=np.float64)
    proj = np.array([r["proj"] for r in rows], dtype=np.float64)
    rng = np.random.RandomState(3)
    ratios = []
    for _ in range(300):
        a, b = rng.randint(0, len(rows), 2)
        if a == b:
            continue
        d0 = np.sum((orig[a] - orig[b]) ** 2)
        d1 = np.sum((proj[a] - proj[b]) ** 2)
        if d0 > 0:
            ratios.append(d1 / d0)
    ratios = np.array(ratios)
    # k=32 planes: distances preserved within ~±50% for the bulk of pairs
    assert 0.4 < np.median(ratios) < 1.6
    assert (np.abs(ratios - 1.0) < 0.8).mean() > 0.9


def test_jl_shortlist_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    signs = jl_signs(32, 64)
    proj = emb.select(
        "vec_id", jl_project("embedding", signs).alias("proj")
    ).cache()
    k = 10
    q = proj.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), F.col("proj").alias("qvec")
    )
    b = proj.select(F.col("vec_id").alias("id"), F.col("proj").alias("vec"))
    short = knn_exact(q, b, 6 * k)
    qo = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    bo = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    truth = knn_exact(qo, bo, k).toPandas()
    sp = short.toPandas()
    got = set(zip(sp.query_id, sp.neighbor_id))
    want = list(zip(truth.query_id, truth.neighbor_id))
    recall = sum(1 for p in want if p in got) / len(want)
    proj.unpersist()
    # iid-Gaussian 64-dim corpora are JL's worst case (distances concentrate,
    # true top-10 are near-ties — the same ceiling PLAN.md records for IVF
    # recall on this data); the gate is "far above the random-shortlist
    # baseline" (60/500 = 0.12), not near-perfect recall
    assert recall >= 0.45, recall

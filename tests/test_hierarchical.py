"""Hierarchical two-level k-means (A11) + index build on its centroids."""

import numpy as np
from pyspark.sql import functions as F

from rabitq_spark.config import RaBitQConfig
from rabitq_spark.index import build_index, search
from rabitq_spark.index.build import hierarchical_kmeans_centroids
from rabitq_spark.operators.knn import knn_exact


def test_hierarchical_centroids_and_build(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    cents = hierarchical_kmeans_centroids(base, "vec", k_top=4, k_down=4)
    assert cents.shape[1] == 64
    assert 4 <= cents.shape[0] <= 16
    assert np.isfinite(cents).all()

    # centroids feed the normal build; exhaustive search must still be exact
    cfg = RaBitQConfig(n_clusters=cents.shape[0], topk=5)
    model = build_index(base, cfg, centroids=cents)
    queries = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = knn_exact(queries, base, 5).toPandas().sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    exh = search(
        model, queries, topk=5, nprobe=model.n_clusters, overfetch=10**6
    ).toPandas().sort_values(["query_id", "rank"], ignore_index=True)
    import pandas as pd

    pd.testing.assert_frame_equal(exh, exact, check_exact=True)

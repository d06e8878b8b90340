"""Embedding statistics: agreement with numpy, norm-stat sanity."""

import numpy as np
from pyspark.sql import functions as F

from rabitq_spark.operators.embstats import embedding_norm_stats, embedding_stats


def test_stats_match_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("label", "embedding").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r["embedding"])
    out = embedding_stats(emb).collect()
    for r in out:
        arr = np.array(by_label[r["group"]], dtype=np.float64)
        assert r["n"] == len(arr)
        assert abs(r["mean_val"] - arr[:, r["dim"]].mean()) < 1e-9
        assert abs(r["var_val"] - arr[:, r["dim"]].var()) < 1e-9


def test_norm_stats_flag_scale(spark):
    rows = [(0, [1.0, 0.0]), (0, [0.0, 2.0]), (1, [0.0, 0.0])]
    df = spark.createDataFrame(rows, ["label", "embedding"]).select(
        "label", F.col("embedding").cast("array<float>").alias("embedding")
    )
    out = {r["group"]: r for r in embedding_norm_stats(df).collect()}
    assert out[0]["min_norm_sq"] == 1.0 and out[0]["max_norm_sq"] == 4.0
    assert abs(out[0]["mean_norm_sq"] - 2.5) < 1e-12
    assert out[1]["max_norm_sq"] == 0.0  # dead-encoder signal

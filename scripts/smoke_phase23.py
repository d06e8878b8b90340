"""Phase-2/3 smoke: build IVF+RaBitQ index on sf0.01 embeddings; check
(a) exhaustive search == exact brute force, (b) approximate recall."""

import time

import pandas as pd
from pyspark.sql import functions as F

from rabitq_spark.config import RaBitQConfig
from rabitq_spark.index import build_index, search
from rabitq_spark.operators.knn import knn_exact
from rabitq_spark.session import get_spark

SF = "/root/testdata/sf0.01"
K = 10
NQ = 20

spark = get_spark("smoke_phase23")
emb = spark.read.parquet(f"{SF}/embeddings.parquet")
base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
queries = emb.filter(f"vec_id < {NQ}").select(
    F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
)

cfg = RaBitQConfig(n_clusters=16, nprobe=4, topk=K, overfetch=4)
t0 = time.time()
model = build_index(base, cfg)
model.index_df.cache().count()
print("build took", round(time.time() - t0, 1), "s")
print("index sample:")
model.index_df.show(3, truncate=80)
print("cluster sizes:", sorted(
    r[1] for r in model.index_df.groupBy("cluster_id").count().collect()
))

exact = knn_exact(queries, base, K).toPandas().sort_values(
    ["query_id", "rank"], ignore_index=True
)

# (a) exhaustive => must equal exact (bit-for-bit dist, same ranking)
t0 = time.time()
exh = search(model, queries, topk=K, nprobe=model.n_clusters, overfetch=10**6)
exh = exh.toPandas().sort_values(["query_id", "rank"], ignore_index=True)
print("exhaustive search took", round(time.time() - t0, 1), "s")
pd.testing.assert_frame_equal(exh, exact, check_exact=True)
print("EXHAUSTIVE == EXACT (bit-identical)")

# (b) approximate recall@K
t0 = time.time()
approx = search(model, queries).toPandas()
print("approx search took", round(time.time() - t0, 1), "s")
merged = approx.merge(exact, on=["query_id", "neighbor_id"], how="inner")
recall = len(merged) / len(exact)
print(f"recall@{K} (nprobe={cfg.nprobe}/16, overfetch={cfg.overfetch}): {recall:.3f}")
assert recall >= 0.8, recall
spark.stop()
print("PHASE 2+3 SMOKE PASSED")

"""One-off experiment: at the bench scale probe's 1M x 256 mixture, which
knob actually moves recall@10 — nprobe (coverage) or overfetch (estimator
screen width)? Informs the scale-aware defaults (round-3 verdict item 2)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from rabitq_spark.config import RaBitQConfig
from rabitq_spark.index import build_index, search
from rabitq_spark.operators.knn import knn_exact_fast
from rabitq_spark.session import get_spark

N_BASE, NQ, DIM, TOPK = 1_000_000, 1000, 256, 10

spark = get_spark("tune_scale")
spark.sparkContext.setLogLevel("ERROR")
centers = np.random.default_rng(7).standard_normal((64, DIM)) * 3

def gen(it):
    import pandas as pd
    for pdf in it:
        ids = pdf["id"].values
        rng = np.random.default_rng(7 ^ int(ids[0]))
        lab = rng.integers(0, 64, len(ids))
        vecs = (centers[lab] + rng.standard_normal((len(ids), DIM))).astype(np.float32)
        yield pd.DataFrame({"id": ids, "vec": list(vecs)})

base = spark.range(N_BASE).repartition(32).mapInPandas(gen, "id bigint, vec array<float>").cache()
base.count()
queries = base.limit(NQ).select(F.col("id").alias("query_id"), F.col("vec").alias("qvec")).cache()
queries.count()

k_clusters = int(np.sqrt(N_BASE))
cfg = RaBitQConfig(n_clusters=k_clusters, nprobe=k_clusters // 32, topk=TOPK, overfetch=16)
t0 = time.perf_counter()
model = build_index(base, cfg, kmeans_sample_fraction=50_000 / N_BASE)
model.index_df = model.index_df.cache(); model.index_df.count()
model.base_df = model.base_df.cache(); model.base_df.count()
print(f"build: {time.perf_counter()-t0:.1f}s, n_clusters={k_clusters}")

exact = knn_exact_fast(queries, base, TOPK).toPandas()
search(model, queries.limit(10)).write.format("noop").mode("overwrite").save()

for nprobe, overfetch in [(31, 16), (31, 32), (31, 64), (62, 16), (62, 32), (100, 16), (100, 32), (62, 64), (100, 64)]:
    t0 = time.perf_counter()
    approx = search(model, queries, topk=TOPK, nprobe=nprobe, overfetch=overfetch).toPandas()
    dt = time.perf_counter() - t0
    hits = approx.merge(exact[["query_id", "neighbor_id"]], on=["query_id", "neighbor_id"])
    print(f"nprobe={nprobe:4d} overfetch={overfetch:3d}: recall={len(hits)/len(exact):.4f} wall={dt:.1f}s")
spark.stop()

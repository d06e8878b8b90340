"""Standalone 1M x 256 end-to-end kernel A/B (jvm vs fused vs fastscan),
mirroring bench.py's scale-probe geometry — for iterating on the
shortlist selection path without the full bench."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "64g")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from rabitq_spark.index.build import build_index, RaBitQConfig
from rabitq_spark.index.search import search

n_base, dim, nq, TOPK = 1_000_000, 256, 1000, 10
df = spark.range(n_base).select(
    F.col("id"),
    F.transform(F.sequence(F.lit(1), F.lit(dim)),
        lambda i: F.hash(F.col("id") * dim + i).cast("float") / 2147483647.0
    ).alias("vec"),
).cache()
df.count()
queries = df.limit(nq).select(F.col("id").alias("query_id"), F.col("vec").alias("qvec")).cache()
queries.count()
k_clusters = int(np.sqrt(n_base))
cfg = RaBitQConfig(n_clusters=k_clusters, nprobe=k_clusters // 32, topk=TOPK, overfetch=16)
t0 = time.perf_counter()
model = build_index(df, cfg, kmeans_sample_fraction=50_000 / n_base, n_rows=n_base)
model.index_df = model.index_df.cache(); model.index_df.count()
model.base_df = model.base_df.cache(); model.base_df.count()
print(f"build: {time.perf_counter()-t0:.1f}s")

ref = None
for impl in ("jvm", "fused", "fastscan"):
    search(model, queries.limit(10), impl=impl).write.format("noop").mode("overwrite").save()
    times = []
    for rep in range(2):
        t0 = time.perf_counter()
        got = search(model, queries, impl=impl).toPandas()
        times.append(time.perf_counter() - t0)
    got = got.sort_values(["query_id", "rank"], ignore_index=True)
    eq = "" if ref is None else f" equal={ref.equals(got)}"
    if ref is None: ref = got
    print(f"{impl}: {[round(t,2) for t in times]}s{eq}")
spark.stop()

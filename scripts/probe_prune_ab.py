"""A/B the per-search cost of partition pruning on a MEMORY-CACHED index.

Mirrors the bench headline geometry (sf0.1 base/queries, n_clusters=32,
nprobe=28, overfetch=32): repeated `search(model, queries)` with
prune_partitions True vs False, interleaved, reporting wall + job counts.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from rabitq_spark.config import RaBitQConfig
from rabitq_spark.index import build_index, search
from rabitq_spark.session import get_spark


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("probe_prune_ab")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    n_vecs = emb.count()
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    queries = (
        emb.select(
            (F.col("vec_id") % n_vecs).alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
        .limit(1000)
        .cache()
    )
    queries.count()
    cfg = RaBitQConfig(n_clusters=32, nprobe=28, topk=10, overfetch=32)
    model = build_index(base, cfg)
    model.index_df = model.index_df.cache()
    model.index_df.count()
    model.base_df = model.base_df.cache()
    model.base_df.count()
    print("index storageLevel:", model.index_df.storageLevel)

    def n_jobs() -> int:
        return sc._jsc.sc().statusStore().jobsList(None).size()

    # warm both shapes
    search(model, queries).write.format("noop").mode("overwrite").save()
    search(model, queries, prune_partitions=False).write.format("noop").mode(
        "overwrite"
    ).save()

    for tag, kw in (("prune", {}), ("noprune", {"prune_partitions": False})):
        runs, j0 = [], n_jobs()
        for _ in range(reps):
            t0 = time.perf_counter()
            search(model, queries, **kw).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"RESULT {tag}: reps={runs} jobs={n_jobs() - j0}", flush=True)

    # equality check (same rows either way)
    a = (
        search(model, queries)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    b = (
        search(model, queries, prune_partitions=False)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    print("equal:", a.equals(b))
    spark.stop()


if __name__ == "__main__":
    main()

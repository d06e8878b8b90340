"""Tune the 10M probe operating point: recall vs candidate mass vs wall.

Builds ONE flat model (50k-sample Lloyd, k=3162 — the r10 recipe), reuses
the saved hierarchical model's vecstore sidecar (clustering-independent),
then sweeps nprobe on 300-query slices through the forced fastscan kernel,
reporting recall vs brute, analytic candidate mass, and slice wall.

Usage: PYTHONPATH=. python scripts/tune10m.py
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from rabitq_spark.config import RaBitQConfig
from rabitq_spark.index.build import build_index
from rabitq_spark.index.search import _prepare_probes, search
from rabitq_spark.index.vecstore import VecStore
from rabitq_spark.operators.knn import knn_exact_fast
from rabitq_spark.session import get_spark

BASE_DIR = "/root/repo/.benchdata/scale10m_256"
STORE_DIR = "/root/repo/.benchdata/scale10m_256_model_mb4/vecstore"


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark("tune10m")
    spark.sparkContext.setLogLevel("ERROR")
    n_base = 10_000_000
    base = spark.read.parquet(BASE_DIR)
    q = (
        base.orderBy("id")
        .limit(300)
        .select(F.col("id").alias("query_id"), F.col("vec").alias("qvec"))
        .localCheckpoint(eager=True)
    )
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3162
    cfg = RaBitQConfig(
        n_clusters=k, nprobe=16, topk=10, overfetch=16, bits_per_dim=4
    )
    t0 = time.perf_counter()
    model = build_index(
        base, cfg, kmeans_sample_fraction=50_000 / n_base, n_rows=n_base
    )
    model.index_df = model.index_df.persist(StorageLevel.DISK_ONLY)
    model.index_df.count()
    model.vec_store = VecStore.open(STORE_DIR)
    print(json.dumps({"build_sec": round(time.perf_counter() - t0, 1)}), flush=True)

    sizes = {
        r["cluster_id"]: r["n"]
        for r in model.index_df.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    sz = np.array(sorted(sizes.values()))
    print(
        json.dumps(
            {
                "n_clusters_eff": len(sz),
                "cluster_median": int(np.median(sz)),
                "cluster_p95": int(np.percentile(sz, 95)),
                "cluster_max": int(sz.max()),
            }
        ),
        flush=True,
    )

    t0 = time.perf_counter()
    exact = knn_exact_fast(q, base, 10).toPandas()
    print(json.dumps({"brute_300q_sec": round(time.perf_counter() - t0, 1)}), flush=True)

    # warmup
    search(model, q.limit(10)).write.format("noop").mode("overwrite").save()
    for nprobe in (6, 8, 10, 12, 16):
        probe_pdf = (
            _prepare_probes(model, q, "query_id", "qvec", nprobe)
            .select("cluster_id")
            .toPandas()
        )
        cands = float(probe_pdf["cluster_id"].map(sizes).sum()) / 300
        t0 = time.perf_counter()
        got = search(
            model,
            q,
            nprobe=nprobe,
            impl="fastscan",
            fastscan_max_lut_bytes=1 << 31,
            arrow_min_queries_per_cluster=0,
        ).toPandas()
        wall = time.perf_counter() - t0
        hits = got.merge(
            exact[["query_id", "neighbor_id"]], on=["query_id", "neighbor_id"]
        )
        print(
            json.dumps(
                {
                    "nprobe": nprobe,
                    "cands_per_q": round(cands, 0),
                    "fastscan_300q_sec": round(wall, 1),
                    "recall": round(len(hits) / max(len(exact), 1), 4),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""Measure multi-bit base codes at the 1M scale probe: recall and wall time
vs the 1-bit estimator at matched and reduced rerank budgets.

Hypothesis: the sharper B-bit estimator holds recall with a much smaller
overfetch, cutting the rerank join volume — the knob that decides whether
IVF beats brute force at this scale.

Usage: PYTHONPATH=/root/repo python scripts/multibit_probe.py [n_base]
"""

from __future__ import annotations

import sys
import time

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from rabitq_spark.config import RaBitQConfig
from rabitq_spark.index import build_index, search
from rabitq_spark.operators.knn import knn_exact_fast
from rabitq_spark.session import get_spark

TOPK = 10
NQ = 1000


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = 256
    spark = get_spark("multibit_probe")
    spark.sparkContext.setLogLevel("ERROR")
    centers = np.random.default_rng(7).standard_normal((64, dim)) * 3

    def gen(it):
        import pandas as pd

        for pdf in it:
            ids = pdf["id"].values
            rng = np.random.default_rng(7 ^ int(ids[0]))
            lab = rng.integers(0, 64, len(ids))
            vecs = (centers[lab] + rng.standard_normal((len(ids), dim))).astype(
                np.float32
            )
            yield pd.DataFrame({"id": ids, "vec": list(vecs)})

    base = (
        spark.range(n_base)
        .repartition(32)
        .mapInPandas(gen, "id bigint, vec array<float>")
        .cache()
    )
    base.count()
    queries = (
        base.limit(NQ)
        .select(F.col("id").alias("query_id"), F.col("vec").alias("qvec"))
        .cache()
    )
    queries.count()
    t0 = time.perf_counter()
    exact = knn_exact_fast(queries, base, TOPK).toPandas()
    brute_s = time.perf_counter() - t0
    print(f"brute: {brute_s:.2f}s")

    k_clusters = int(np.sqrt(n_base))
    for bits, overfetches in [(1, [62, 16]), (2, [16, 8]), (4, [16, 8, 4])]:
        cfg = RaBitQConfig(
            n_clusters=k_clusters,
            nprobe=k_clusters // 32,
            topk=TOPK,
            overfetch=16,
            bits_per_dim=bits,
        )
        t0 = time.perf_counter()
        model = build_index(
            base, cfg, kmeans_sample_fraction=50_000 / n_base, n_rows=n_base
        )
        model.index_df = model.index_df.cache()
        model.index_df.count()
        model.base_df = model.base_df.cache()
        model.base_df.count()
        build_s = time.perf_counter() - t0
        search(model, queries.limit(10)).write.format("noop").mode(
            "overwrite"
        ).save()
        for of in overfetches:
            t0 = time.perf_counter()
            approx = search(model, queries, overfetch=of).toPandas()
            ivf_s = time.perf_counter() - t0
            hits = approx.merge(
                exact[["query_id", "neighbor_id"]], on=["query_id", "neighbor_id"]
            )
            recall = len(hits) / max(len(exact), 1)
            print(
                f"bits={bits} overfetch={of}: build={build_s:.2f}s "
                f"search={ivf_s:.2f}s recall={recall:.4f}"
            )
        model.index_df.unpersist()
        model.base_df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()

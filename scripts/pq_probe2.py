"""Follow-up to pq_probe.py: the Arrow (columnar-gather) ADC paths at
1M × 256 — flat PQ and IVF-PQ — including the wider-shortlist points the
low flat-PQ recall demands, and the large-batch IVF-PQ configuration that
OOM'd the materialized-LUT plan (fixed: on-the-fly per-cell LUTs).

Usage: PYTHONPATH=/root/repo python scripts/pq_probe2.py [n_base]
"""

from __future__ import annotations

import sys
import time

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from rabitq_spark.index.pq import (
    ivfpq_encode,
    ivfpq_search,
    ivfpq_train,
    pq_encode,
    pq_search,
    pq_train,
)
from rabitq_spark.operators.knn import knn_exact_fast
from rabitq_spark.session import get_spark

TOPK = 10
NQ = 1000


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = 256
    spark = get_spark("pq_probe2")
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
    print(f"brute nq={NQ}: {time.perf_counter() - t0:.2f}s", flush=True)
    truth = exact[["query_id", "neighbor_id"]]

    def recall(approx) -> float:
        sub = truth[truth.query_id.isin(set(approx.query_id))]
        return len(approx.merge(sub, on=["query_id", "neighbor_id"])) / max(
            len(sub), 1
        )

    # --- flat PQ, arrow impl, full 1000-query batch
    t0 = time.perf_counter()
    cb = pq_train(base, "vec", m=32, ksub=256, iters=8)
    pcoded = pq_encode(base, cb).cache()
    pcoded.count()
    print(f"pq train+encode: {time.perf_counter() - t0:.2f}s", flush=True)
    for sl in (64, 640):
        t0 = time.perf_counter()
        got = pq_search(
            queries, base, TOPK, cb, shortlist=sl, coded_base=pcoded, impl="arrow"
        ).toPandas()
        print(
            f"pq-arrow m=32 nq={NQ} shortlist={sl}: "
            f"search={time.perf_counter() - t0:.2f}s recall={recall(got):.4f}",
            flush=True,
        )
    pcoded.unpersist()

    # --- IVF-PQ, arrow impl (the config that OOM'd the LUT plan)
    n_clusters = int(np.sqrt(n_base))
    t0 = time.perf_counter()
    coarse, rcb = ivfpq_train(
        base, "vec", n_clusters=n_clusters, m=32, ksub=256, iters=8
    )
    icoded = ivfpq_encode(base, coarse, rcb).cache()
    icoded.count()
    print(
        f"ivfpq train+encode ({n_clusters} cells): {time.perf_counter() - t0:.2f}s",
        flush=True,
    )
    for nprobe, sl in (
        (n_clusters // 16, 64),
        (n_clusters // 16, 640),
        (n_clusters // 32, 640),
    ):
        t0 = time.perf_counter()
        got = ivfpq_search(
            queries, icoded, TOPK, coarse, rcb,
            nprobe=nprobe, shortlist=sl, impl="arrow",
        ).toPandas()
        print(
            f"ivfpq-arrow nq={NQ} nprobe={nprobe}/{n_clusters} shortlist={sl}: "
            f"search={time.perf_counter() - t0:.2f}s recall={recall(got):.4f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

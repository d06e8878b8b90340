"""Quantizer bake-off at the 1M × 256 scale probe: brute force vs SQ8 vs
flat PQ vs IVF-PQ (and the RaBitQ families measured by multibit_probe.py),
recall@10 and wall seconds at serving-shaped budgets.

What this decides: which codec the 100 TB deployment scans. PQ codes are
m ints/row (vs 256 floats) so the rough scan reads ~1/64th of the bytes;
IVF-PQ additionally prunes to nprobe/n_clusters of the rows. The exact
rerank restores correctness in every family — the families differ only in
rough-ordering quality per byte.

Usage: PYTHONPATH=/root/repo python scripts/pq_probe.py [n_base]
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
from rabitq_spark.index.sq8 import sq8_search, sq8_train
from rabitq_spark.operators.knn import knn_exact_fast
from rabitq_spark.session import get_spark

TOPK = 10
NQ = 1000


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = 256
    spark = get_spark("pq_probe")
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
    # flat-scan families (SQ8, flat PQ) pay O(n) rough work PER QUERY —
    # at 1M x 256 a 1000-query batch is 10^9 scored pairs, so they run at
    # NQ_FLAT queries (cost scales linearly in nq; the per-query number is
    # the honest unit). IVF-PQ probes a fraction of cells and runs the
    # full batch.
    NQ_FLAT = 100
    qflat = queries.limit(NQ_FLAT).cache()
    qflat.count()
    t0 = time.perf_counter()
    exact = knn_exact_fast(queries, base, TOPK).toPandas()
    print(f"brute nq=1000: {time.perf_counter() - t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    knn_exact_fast(qflat, base, TOPK).write.format("noop").mode("overwrite").save()
    print(f"brute nq={NQ_FLAT}: {time.perf_counter() - t0:.2f}s", flush=True)
    truth = exact[["query_id", "neighbor_id"]]

    def recall(approx) -> float:
        sub = truth[truth.query_id.isin(set(approx.query_id))]
        return len(approx.merge(sub, on=["query_id", "neighbor_id"])) / max(
            len(sub), 1
        )

    # --- SQ8
    t0 = time.perf_counter()
    lo, hi = sq8_train(base, "vec")
    coded = base.select(
        F.col("id").alias("__bid"),
        F.col("vec").alias("__bvec"),
        __import__("rabitq_spark.index.sq8", fromlist=["sq8_encode_expr"])
        .sq8_encode_expr("vec", lo, hi)
        .alias("__bcode"),
    ).cache()
    coded.count()
    print(f"sq8 train+encode: {time.perf_counter() - t0:.2f}s", flush=True)
    for sl in (64, 32):
        t0 = time.perf_counter()
        got = sq8_search(
            qflat, base, TOPK, lo, hi, shortlist=sl, coded_base=coded
        ).toPandas()
        print(
            f"sq8 nq={NQ_FLAT} shortlist={sl}: search={time.perf_counter() - t0:.2f}s "
            f"recall={recall(got):.4f}", flush=True
        )
    coded.unpersist()

    # --- flat PQ (m=32 -> 32 bytes/vec at dim 256)
    t0 = time.perf_counter()
    cb = pq_train(base, "vec", m=32, ksub=256, iters=8)
    pcoded = pq_encode(base, cb).cache()
    pcoded.count()
    print(f"pq train+encode: {time.perf_counter() - t0:.2f}s", flush=True)
    for sl in (64, 32):
        t0 = time.perf_counter()
        got = pq_search(
            qflat, base, TOPK, cb, shortlist=sl, coded_base=pcoded
        ).toPandas()
        print(
            f"pq m=32 nq={NQ_FLAT} shortlist={sl}: search={time.perf_counter() - t0:.2f}s "
            f"recall={recall(got):.4f}", flush=True
        )
    pcoded.unpersist()

    # --- IVF-PQ (sqrt(n) cells, residual codes)
    n_clusters = int(np.sqrt(n_base))
    t0 = time.perf_counter()
    coarse, rcb = ivfpq_train(
        base, "vec", n_clusters=n_clusters, m=32, ksub=256, iters=8
    )
    icoded = ivfpq_encode(base, coarse, rcb).cache()
    icoded.count()
    print(f"ivfpq train+encode ({n_clusters} cells): {time.perf_counter() - t0:.2f}s", flush=True)
    for nprobe, sl in ((n_clusters // 16, 64), (n_clusters // 32, 64)):
        t0 = time.perf_counter()
        got = ivfpq_search(
            queries, icoded, TOPK, coarse, rcb, nprobe=nprobe, shortlist=sl
        ).toPandas()
        print(
            f"ivfpq nq=1000 nprobe={nprobe}/{n_clusters} shortlist={sl}: "
            f"search={time.perf_counter() - t0:.2f}s recall={recall(got):.4f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

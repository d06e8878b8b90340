"""A/B harness for the dedup10m slope's memory sensitivity: runs the
probe's 1M and 10M points (same code path as bench._dedup_scale_probe_10m,
via its corpus generator and the production minhash operator) under
whatever SPARK_DRIVER_MEM the caller sets, and prints the two walls plus
the storage/execution memory peaks Spark reports.

Usage: SPARK_DRIVER_MEM=24g PYTHONPATH=. python scripts/dedup10m_mem_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from rabitq_spark.operators.dedup import (
        neardup_minhash_pairs,
        release_caches,
    )
    from rabitq_spark.session import get_spark

    mem = os.environ.get("SPARK_DRIVER_MEM", "24g")
    spark = get_spark(f"dedup10m_mem_ab_{mem}")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"driver_mem": mem, "points": []}

    for n_docs in (1_000_000, 10_000_000):
        parts = max(32, n_docs // 31_250)
        level = (
            StorageLevel.MEMORY_AND_DISK if n_docs > 1_000_000 else None
        )
        docs = (
            spark.range(n_docs)
            .repartition(parts)
            .mapInPandas(
                bench._gen_planted_docs(),
                "doc_id bigint, text string, partner bigint",
            )
        )
        docs = docs.persist(level) if level else docs.cache()
        docs.count()
        spark.sparkContext.setJobDescription(f"mem_ab minhash {n_docs}")
        t0 = time.perf_counter()
        pairs = neardup_minhash_pairs(docs.select("doc_id", "text")).cache()
        n_pairs = pairs.count()
        sec = time.perf_counter() - t0
        # executor (== driver in local mode) peak memory as Spark saw it
        mem_metrics = {}
        try:
            status = spark.sparkContext.statusTracker()
            _ = status  # statusTracker has no memory view; use REST-less JVM gauge
            jvm_used = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
            mem_metrics = {
                "jvm_used_gb": round(
                    (jvm_used.totalMemory() - jvm_used.freeMemory()) / 2**30, 2
                ),
                "jvm_max_gb": round(jvm_used.maxMemory() / 2**30, 2),
            }
        except Exception:
            pass
        pairs.unpersist()
        docs.unpersist()
        release_caches()
        out["points"].append(
            {
                "n_docs": n_docs,
                "sec": round(sec, 1),
                "docs_per_sec": round(n_docs / sec),
                "pairs": n_pairs,
                **mem_metrics,
            }
        )
        print(json.dumps(out), flush=True)

    p1, p10 = out["points"]
    out["slope_vs_1m"] = round((p10["sec"] / p1["sec"]) / 10.0, 3)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

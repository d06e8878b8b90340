"""Round-12 dispatch-floor A/B: at the sf0.1 headline geometry (2k base,
32 clusters, nprobe 28, 1k queries — ~0.9-1.7M pair-scores) the auto
dispatch keeps the jvm join; this script measures forced jvm vs forced
fused interleaved to pin that floor with a number from THIS host.

Usage: PYTHONPATH=/root/repo python scripts/dispatch_floor_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rabitq_spark.config import RaBitQConfig  # noqa: E402
from rabitq_spark.index import build_index, search  # noqa: E402
from rabitq_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("dispatch_floor_ab")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    queries = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    ).limit(1000).cache()
    queries.count()
    cfg = RaBitQConfig(n_clusters=32, nprobe=28, topk=10, overfetch=32)
    model = build_index(base, cfg)
    model.index_df = model.index_df.cache()
    model.index_df.count()
    model.base_df = model.base_df.cache()
    model.base_df.count()
    # warm both plans
    for kw in (dict(impl="jvm"), dict(impl="fused", arrow_min_queries_per_cluster=0)):
        search(model, queries, **kw).write.format("noop").mode("overwrite").save()
    out: dict = {"geometry": "sf0.1 headline: 2k base, 32 clusters, nprobe 28, 1k queries"}
    runs: dict = {"jvm": [], "fused": [], "auto": []}
    for _ in range(3):
        for name, kw in (
            ("jvm", dict(impl="jvm")),
            ("fused", dict(impl="fused", arrow_min_queries_per_cluster=0)),
            ("auto", {}),
        ):
            t0 = time.perf_counter()
            search(model, queries, **kw).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[name].append(round(time.perf_counter() - t0, 3))
    out["runs"] = runs
    out["medians"] = {
        k: sorted(v)[len(v) // 2] for k, v in runs.items()
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

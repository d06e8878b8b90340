"""Round-12 embedding-blocked kernel A/B: the IVF-blocked near-dup path
(_embedding_neardup_blocked) issues a 200k-query self-search over a
200k x 64, 4-bit index — ~1.07G pair-scores. Pre-r12 the inner search ran
the jvm join plan (impl default "jvm"); r12's auto dispatch resolves
fastscan → (LUT byte gate) → fused at this shape. This script times the
blocked arm with the inner search pinned to each kernel (monkeypatching
the search symbol the operator resolves at call time) and checks the pair
sets are identical.

Usage: PYTHONPATH=/root/repo python scripts/emb_blocked_ab.py [kernels...]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import rabitq_spark.index as index_pkg  # noqa: E402
from rabitq_spark.session import get_spark  # noqa: E402

N_EMB = int(os.environ.get("EMB_AB_ROWS", "200000"))


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark("emb_blocked_ab")
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    from rabitq_spark.operators.dedup import (
        embedding_neardup_pairs,
        release_caches,
    )

    # the same generator the bench probe uses
    probe_src = bench._dedup_embedding_probe.__globals__  # noqa: F841
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    dim, dup_every = 64, 20

    def gen_vecs(it):
        centers = np.random.default_rng(7).standard_normal((64, dim)) * 3
        for pdf in it:
            ids = pdf["id"].values
            rng = np.random.default_rng(11 ^ int(ids[0]))
            lab = rng.integers(0, 64, len(ids))
            vecs = centers[lab] + rng.standard_normal((len(ids), dim))
            prev = np.roll(vecs, 1, axis=0)
            mask = ids % dup_every == 1
            mask[0] = False
            vecs[mask] = prev[mask] + 0.01 * rng.standard_normal((mask.sum(), dim))
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(vecs.astype(np.float32))}
            )

    emb = (
        spark.range(N_EMB)
        .repartition(32)
        .mapInPandas(gen_vecs, "vec_id bigint, embedding array<float>")
        .cache()
    )
    emb.count()

    real_search = index_pkg.search
    out: dict = {"n_emb": N_EMB, "dim": dim}
    kernels = sys.argv[1:] or ["auto", "jvm", "fused", "fastscan"]
    counts = {}
    for name in kernels:
        if name == "auto":
            index_pkg.search = real_search
        elif name == "fastscan":
            index_pkg.search = functools.partial(
                real_search, impl="fastscan",
                arrow_min_queries_per_cluster=0,
                fastscan_max_lut_bytes=1 << 31,
            )
        else:
            index_pkg.search = functools.partial(real_search, impl=name)
        try:
            t0 = time.perf_counter()
            pairs = embedding_neardup_pairs(
                emb, threshold=0.97, broadcast_max_rows=1000, row_count=N_EMB
            )
            n = pairs.count()
            out[f"{name}_sec"] = round(time.perf_counter() - t0, 1)
            counts[name] = n
        finally:
            index_pkg.search = real_search
            release_caches()
        print(json.dumps(out), flush=True)
    out["pair_counts"] = counts
    out["counts_equal"] = len(set(counts.values())) == 1
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

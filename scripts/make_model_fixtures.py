"""Generate DETERMINISM-PIN oracle fixtures for the model-state queries
whose computation no SQL can express but whose RESULT is bit-deterministic
for a fixed corpus + fixed seeds:

    fixtures/ann_ivf_recall_sf0.01.parquet        (n_hits, n_queries, mean_recall)
    fixtures/quality_classifier_sf0.01.parquet    (id, prob, keep)
    fixtures/minhash_lsh_mllib_sf0.01.parquet     (id_a, id_b, jaccard_distance)
    fixtures/brp_lsh_mllib_sf0.01.parquet         (id_a, id_b, l2_distance)

The MLlib-LSH pair pins the library's seeded hash families: the bucket
assignment is version-internal to MLlib, but for a pinned Spark version +
fixed seed the candidate pair set and the exact per-pair distances are
bit-deterministic (verified via scripts/check_lsh_stability.py across
local[4]/shuffle=7 vs local[32]/shuffle=32 — byte-identical parquet).

These are REGRESSION PINS, not independent derivations: the expectation is
the pipeline's own output, recorded once and asserted stable thereafter
(catching any later change to KMeans seeding, probe policy, featurization,
or LR optimization that shifts the result). Bit-determinism across session
shapes was verified empirically before pinning: identical output under
local[4]/shuffle=7 and local[32]/shuffle=32. The honest-oracle queries
(ann_ivf_exhaustive and friends) remain the correctness anchors; these
pins only add driver-visible drift detection for the approximate/learned
surfaces.

Usage: python scripts/make_model_fixtures.py [sf_dir]
"""

from __future__ import annotations

import os
import sys


def main(sf_dir: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from rabitq_spark.queries import (
        q_ann_ivf_recall,
        q_brp_lsh_mllib,
        q_minhash_lsh_mllib,
        q_quality_classifier,
    )

    tag = os.path.basename(sf_dir.rstrip("/"))
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    recall = q_ann_ivf_recall(spark, sf_dir).toPandas()
    recall.to_parquet(
        os.path.join(out_dir, f"ann_ivf_recall_{tag}.parquet"), index=False
    )
    print("recall pin:", recall.to_dict("records"))

    qc = q_quality_classifier(spark, sf_dir).toPandas().sort_values("id")
    qc.to_parquet(
        os.path.join(out_dir, f"quality_classifier_{tag}.parquet"), index=False
    )
    print(f"quality_classifier pin: {len(qc)} rows, keep={int(qc['keep'].sum())}")

    for name, fn in (
        ("minhash_lsh_mllib", q_minhash_lsh_mllib),
        ("brp_lsh_mllib", q_brp_lsh_mllib),
    ):
        df = fn(spark, sf_dir).toPandas()
        df = df.sort_values(by=list(df.columns), ignore_index=True)
        df.to_parquet(os.path.join(out_dir, f"{name}_{tag}.parquet"), index=False)
        print(f"{name} pin: {len(df)} pairs")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")

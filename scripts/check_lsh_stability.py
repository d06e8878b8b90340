"""Empirically verify that the two MLlib-LSH queries are bit-stable across
session shapes (local[4]/shuffle=7 vs local[32]/shuffle=32) before pinning
them as determinism-fixture oracles (round-7 task 1).

Writes /tmp/lsh_stab_{shape}_{name}.parquet; run once per shape, then compare.

Usage: python scripts/check_lsh_stability.py <shape-tag> <master> <shuffle>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main(tag: str, master: str, shuffle: str) -> None:
    from rabitq_spark.queries import q_brp_lsh_mllib, q_minhash_lsh_mllib

    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    sf = "/root/testdata/sf0.01"
    for name, fn in (("minhash", q_minhash_lsh_mllib), ("brp", q_brp_lsh_mllib)):
        df = fn(spark, sf).toPandas()
        df = df.sort_values(by=list(df.columns), ignore_index=True)
        df.to_parquet(f"/tmp/lsh_stab_{tag}_{name}.parquet", index=False)
        print(f"{tag} {name}: {len(df)} rows")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])

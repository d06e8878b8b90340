"""Standalone re-run of the 10M scale probe (warm model cache) for A/B work.

Usage: PYTHONPATH=. python scripts/probe10m_ab.py [--nq 1000]
Prints the probe dict as JSON. Uses the same code path as bench.py's
scale10m phase, so numbers are directly comparable to BENCH_DETAIL.json.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nq", type=int, default=1000)
    args = ap.parse_args()
    import os

    from rabitq_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark("probe10m_ab")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    out = bench._scale_probe_10m(spark, nq=args.nq)
    out["phase_wall_sec"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

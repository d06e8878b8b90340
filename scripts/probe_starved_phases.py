"""Standalone run of the bench phases a tight budget can starve on a
slow/loaded box: the dedup10m three-point slope, the embedding-dedup
probe, and the stateful-streaming state probe.

Usage: PYTHONPATH=. python scripts/probe_starved_phases.py [--skip name ...]
Prints one JSON object with the same sub-dicts bench.py would put in
BENCH_DETAIL.json (dedup_scale_probe_10m / dedup_scale_probe /
state_scale_probe), so gate evidence stays auditable even when the
budgeted run could not fit these phases.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", nargs="*", default=[])
    args = ap.parse_args()
    import os

    from rabitq_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark("probe_starved_phases")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}

    if "dedup10m" not in args.skip:
        spark.sparkContext.setJobDescription("probe: dedup10m slope")
        t0 = time.perf_counter()
        out["dedup_scale_probe_10m"] = bench._dedup_scale_probe_10m(spark)
        out["dedup10m_phase_wall_sec"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(out), flush=True)

    if "dedup_embedding" not in args.skip:
        spark.sparkContext.setJobDescription("probe: dedup embedding")
        t0 = time.perf_counter()
        out["dedup_scale_probe"] = bench._dedup_embedding_probe(spark)
        out["dedup_embedding_phase_wall_sec"] = round(
            time.perf_counter() - t0, 1
        )
        print(json.dumps(out), flush=True)

    if "state" not in args.skip:
        from rabitq_spark.streaming.state_probe import run_state_scale_probe

        spark.sparkContext.setJobDescription("probe: state scale")
        t0 = time.perf_counter()
        out["state_scale_probe"] = run_state_scale_probe(
            spark, n_users=1_000_000
        )
        out["state_phase_wall_sec"] = round(time.perf_counter() - t0, 1)

    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

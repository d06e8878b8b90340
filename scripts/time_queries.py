"""Time selected registry queries with the noop sink (guide §1.4).

Usage: PYTHONPATH=<repo> python scripts/time_queries.py [--sf DIR] [--reps N] name...
Prints one line per query: name, per-rep seconds, and the Spark job count
consumed by the reps (jobs are the load-independent structural signal on a
noisy shared host).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from rabitq_spark.queries import SPARK_QUERIES
from rabitq_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--warm-sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def n_jobs() -> int:
        return sc._jsc.sc().statusStore().jobsList(None).size()

    for name in args.names:
        fn = SPARK_QUERIES[name]
        # warmup at the smallest SF: codegen/JIT hot, same plan shapes
        fn(spark, args.warm_sf).write.format("noop").mode("overwrite").save()
        runs = []
        j0 = n_jobs()
        for _ in range(args.reps):
            sc.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        njobs = n_jobs() - j0
        print(
            f"RESULT {name}: reps={[round(r, 2) for r in runs]} "
            f"jobs/{args.reps}reps={njobs}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

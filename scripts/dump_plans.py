"""Dump .explain("formatted") for registry queries to plans/<tag>/<name>.txt.

Usage: PYTHONPATH=<repo> python scripts/dump_plans.py --out plans/r11 \
       --suffix _after [--sf DIR] name...

Streaming/stateful queries execute their staging + micro-batch loop at
construction time; the captured plan is the returned (final) DataFrame's.
For those the load-bearing evidence is the Spark JOB COUNT during
construction (scripts/time_queries.py reports it), noted alongside in
OPTIMIZATION_r11.md.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")

from rabitq_spark.queries import SPARK_QUERIES
from rabitq_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="plans/r11")
    ap.add_argument("--suffix", default="")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in args.names:
        df = SPARK_QUERIES[name](spark, args.sf)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} B)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

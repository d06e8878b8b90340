"""Standalone fuzzy_name_pairs sf1/sf3 slope measurement (round 11).

Replicates bench.py::_llm_slope_probe's fuzzy gate exactly — same session
defaults, same noop sink, same Observation-counted output rows, same
slope = (t3/t1) / max(3, out3/out1) <= 1.3 gate — so the before/after of
the distinct-text blocking rewrite is measured against the gate it must
pass. Also dumps the top stages by executor time with shuffle/spill bytes.

Usage: PYTHONPATH=/root/repo python scripts/fuzzy_slope_ab.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Observation
from pyspark.sql import functions as F

from rabitq_spark.queries import SPARK_QUERIES
from rabitq_spark.session import get_spark


def main() -> None:
    sf1 = "/root/repo/.benchdata/sf1.0"
    sf3 = "/root/repo/.benchdata/sf3.0"
    spark = get_spark("fuzzy_slope_ab")
    spark.sparkContext.setLogLevel("ERROR")
    fn = SPARK_QUERIES["fuzzy_name_pairs"]

    def timed_count(sf_dir) -> tuple[float, int]:
        obs = Observation()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir).observe(obs, F.count(F.lit(1)).alias("n"))
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0, int(obs.get["n"])

    # warm: JIT/codegen hot, same plan shapes (bench methodology)
    spark.sparkContext.setJobDescription("fuzzy warm sf1")
    timed_count(sf1)
    spark.sparkContext.setJobDescription("fuzzy timed sf1")
    t1, n1 = timed_count(sf1)
    spark.sparkContext.setJobDescription("fuzzy timed sf3")
    t3, n3 = timed_count(sf3)
    out_ratio = n3 / max(n1, 1)
    slope = (t3 / max(t1, 1e-9)) / max(3.0, out_ratio)
    print(
        f"RESULT sf1 {t1:.1f}s ({n1} rows)  sf3 {t3:.1f}s ({n3} rows)  "
        f"out_ratio {out_ratio:.2f}  slope {slope:.3f}  "
        f"gate<=1.3 {slope <= 1.3}",
        flush=True,
    )

    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        stages = store.stageList(None)
        rows = []
        for i in range(stages.size()):
            s = stages.apply(i)
            rows.append(
                (
                    s.executorRunTime() / 1000.0,
                    s.stageId(),
                    s.numCompleteTasks(),
                    s.shuffleReadBytes() / 2**30,
                    s.shuffleWriteBytes() / 2**30,
                    s.memoryBytesSpilled() / 2**30,
                    s.diskBytesSpilled() / 2**30,
                    s.name().split("\n")[0][:60],
                )
            )
        rows.sort(reverse=True)
        print("exec_s  stage tasks  shR_GiB shW_GiB  spillMem_GiB spillDisk_GiB")
        for r in rows[:12]:
            print(
                f"{r[0]:7.1f} {r[1]:5d} {r[2]:5d} {r[3]:8.2f} {r[4]:7.2f}"
                f" {r[5]:12.2f} {r[6]:13.2f}  {r[7]}"
            )
    except Exception as e:  # noqa: BLE001 — the status-store v1 API is not
        # py4j-reachable on every Spark build; the slope RESULT line above is
        # the gate evidence, the stage table is optional color
        print(f"(stage table unavailable: {type(e).__name__})")
    spark.stop()


if __name__ == "__main__":
    main()

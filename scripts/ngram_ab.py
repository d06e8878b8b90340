"""Round-7 task: A/B the neardup_ngram sf1 regression (r5 16.07 s ->
r6 22.8-23.0 s with no code change to the path).

Runs q_neardup_ngram at .benchdata/sf1.0 in a FRESH bench-shaped session
(local[32], shuffle=32), n runs, prints per-run wall seconds. Invoke once
from the current HEAD checkout and once from a worktree at the r5 commit,
interleaved, to separate code from host/context.

Usage: python scripts/ngram_ab.py <repo_root> <label> [n_runs]
"""

from __future__ import annotations

import sys
import time


def main(repo: str, label: str, n: int) -> None:
    sys.path.insert(0, repo)
    from rabitq_spark.queries import q_neardup_ngram
    from rabitq_spark.session import get_spark

    spark = get_spark(f"ngram_ab_{label}")
    sf1 = "/root/repo/.benchdata/sf1.0"
    for i in range(n):
        t0 = time.perf_counter()
        cnt = q_neardup_ngram(spark, sf1).count()
        dt = time.perf_counter() - t0
        print(f"AB {label} run{i}: {dt:.2f}s rows={cnt}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2)

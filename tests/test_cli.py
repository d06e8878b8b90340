"""CLI parity flow (reference crates/cli/src/main.rs): train+save on first
run, load on second, QPS + recall reported; convert subcommand migrates
.fvecs to parquet."""

import json

import numpy as np
from pyspark.sql import functions as F

from rabitq_spark.__main__ import main
from rabitq_spark.sources.vecs import write_vecs


def _fixtures(tmp_path, n=2000, dim=32, nq=20, k=5):
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((16, dim)).astype(np.float32) * 2
    lab = rng.integers(0, 16, n)
    base = (centers[lab] + rng.standard_normal((n, dim))).astype(np.float32)
    queries = base[:nq] + 0.05 * rng.standard_normal((nq, dim)).astype(np.float32)
    d2 = ((base[None].astype(np.float64) - queries[:, None]) ** 2).sum(axis=2)
    gt = np.argsort(d2, axis=1, kind="stable")[:, :k].astype(np.int32)
    bp, qp, tp = (str(tmp_path / x) for x in ("b.fvecs", "q.fvecs", "t.ivecs"))
    write_vecs(bp, base, "fvecs")
    write_vecs(qp, queries, "fvecs")
    write_vecs(tp, gt, "ivecs")
    return bp, qp, tp, k


def test_cli_run_train_then_load(spark, tmp_path, capsys):
    bp, qp, tp, k = _fixtures(tmp_path)
    saved = str(tmp_path / "saved")
    argv = ["run", "-b", bp, "-q", qp, "-t", tp, "-s", saved,
            "-p", "100", "-k", str(k)]
    assert main(argv) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["n_queries"] == 20 and first["recall"] >= 0.9

    # second invocation loads the saved dir (no retrain) and agrees
    assert main(argv) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["recall"] == first["recall"]


def test_cli_convert(spark, tmp_path, capsys):
    bp, _, _, _ = _fixtures(tmp_path, n=200, nq=2)
    dst = str(tmp_path / "conv_parquet")
    assert main(["convert", "--src", bp, "--dst", dst]) == 0
    df = spark.read.parquet(dst)
    assert df.count() == 200
    assert df.filter(F.col("id") == 0).first()["vec"] is not None

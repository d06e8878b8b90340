"""GIST-style fvecs lifecycle at non-toy dim (round-4 verdict item 8): the
reference CLI flow (crates/cli/src/main.rs:40-83 — read base .fvecs, build,
save, load, query, score recall against a ground-truth .ivecs) end-to-end
through sources/vecs.py + the IVF index, on ACTUAL .fvecs/.ivecs bytes."""

import numpy as np
from pyspark.sql import functions as F

from rabitq_spark.config import RaBitQConfig
from rabitq_spark.index import RaBitQModel, build_index, search
from rabitq_spark.sources.vecs import (
    convert_vecs_to_parquet,
    read_vecs,
    write_vecs,
)

N_BASE = 10_000
N_QUERY = 50
DIM = 128
K = 10


def _gist_like(rng: np.random.Generator, n: int) -> np.ndarray:
    centers = rng.standard_normal((64, DIM)).astype(np.float32) * 2.0
    lab = rng.integers(0, 64, n)
    return (centers[lab] + rng.standard_normal((n, DIM))).astype(np.float32)


def test_fvecs_convert_build_search_recall(spark, tmp_path):
    rng = np.random.default_rng(42)
    base_np = _gist_like(rng, N_BASE)
    query_np = base_np[:N_QUERY] + 0.05 * rng.standard_normal(
        (N_QUERY, DIM)
    ).astype(np.float32)

    # ground truth ids per query (exact L2), written as .ivecs like the
    # reference datasets ship it
    d2 = (
        (base_np[None, :, :].astype(np.float64) - query_np[:, None, :]) ** 2
    ).sum(axis=2)
    gt = np.argsort(d2, axis=1, kind="stable")[:, :K].astype(np.int32)

    base_path = str(tmp_path / "base.fvecs")
    query_path = str(tmp_path / "query.fvecs")
    gt_path = str(tmp_path / "gt.ivecs")
    write_vecs(base_path, base_np, "fvecs")
    write_vecs(query_path, query_np, "fvecs")
    write_vecs(gt_path, gt, "ivecs")

    # S1 scan + S3 migration: fvecs -> parquet, bit-preserving
    pq_path = str(tmp_path / "base_parquet")
    convert_vecs_to_parquet(spark, base_path, pq_path, "fvecs")
    base_df = spark.read.parquet(pq_path)
    assert base_df.count() == N_BASE
    first = base_df.filter(F.col("id") == 7).first()["vec"]
    assert np.array_equal(np.asarray(first, dtype=np.float32), base_np[7])

    # build -> S6 save -> load (the production serve path) -> search
    model = build_index(
        base_df, RaBitQConfig(n_clusters=100, nprobe=20, topk=K)
    )
    model_dir = str(tmp_path / "model")
    model.save(model_dir)
    loaded = RaBitQModel.load(spark, model_dir)
    assert loaded.dim == DIM

    queries = read_vecs(spark, query_path, "fvecs").select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    got = search(loaded, queries, topk=K).toPandas()
    assert set(got["query_id"]) == set(range(N_QUERY))

    gt_df = read_vecs(spark, gt_path, "ivecs").toPandas().sort_values("id")
    gt_sets = {int(r["id"]): set(int(x) for x in r["vec"]) for _, r in gt_df.iterrows()}
    hits = sum(
        1
        for _, r in got.iterrows()
        if int(r["neighbor_id"]) in gt_sets[int(r["query_id"])]
    )
    recall = hits / (N_QUERY * K)
    assert recall >= 0.9, f"recall {recall} below gate at dim={DIM}"

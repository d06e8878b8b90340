"""Non-multiple-of-64 dimensions (zero-padding path, src/rabitq.rs:167-179)
and the debug determinism hooks (identity rotation + fixed bias)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from rabitq_spark.config import RaBitQConfig
from rabitq_spark.index import build_index, search
from rabitq_spark.operators.knn import knn_exact


def _random_table(spark, n, dim, seed):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    rows = [(i, mat[i].tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "id bigint, vec array<float>")


def test_dim100_padding_exhaustive_exact(spark):
    # dim=100 -> padded to 128; exhaustive search must still equal brute force
    base = _random_table(spark, 300, 100, seed=11)
    queries = base.filter("id < 6").select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    cfg = RaBitQConfig(n_clusters=6, topk=4)
    model = build_index(base, cfg)
    assert model.dim == 100 and model.dim_pad == 128
    exact = knn_exact(queries, base, 4).toPandas().sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    exh = search(
        model, queries, topk=4, nprobe=model.n_clusters, overfetch=10**6
    ).toPandas().sort_values(["query_id", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(exh, exact, check_exact=True)


def test_debug_deterministic_build_reproducible(spark):
    base = _random_table(spark, 200, 64, seed=5)
    cfg = RaBitQConfig(n_clusters=4, topk=3)
    cents = np.vstack(
        [r.vec for r in base.filter("id < 4").collect()]
    ).astype(np.float32)

    def build_codes():
        m = build_index(base, cfg, centroids=cents, debug_deterministic=True)
        assert np.allclose(m.rotation, np.eye(64))
        assert np.all(m.rand_bias == 0.5)
        return (
            m.index_df.orderBy("orig_id")
            .select("orig_id", "cluster_id", "code", "center_dist_sq")
            .toPandas()
        )

    a, b = build_codes(), build_codes()
    # exact reproducibility cross-run (and cross-partitioning, since the
    # transform is per-row with broadcast state)
    assert a["cluster_id"].tolist() == b["cluster_id"].tolist()
    assert [list(c) for c in a["code"]] == [list(c) for c in b["code"]]
    np.testing.assert_array_equal(
        a["center_dist_sq"].values, b["center_dist_sq"].values
    )
    # with P = I, codes must equal sign bits of (x - centroid) directly
    row = a.iloc[0]
    x = np.array(base.filter(f"id = {row.orig_id}").first().vec, np.float32)
    c = cents[row.cluster_id]
    want_bits = (x - c) > 0
    got = np.array([np.uint64(w) for w in row.code], dtype=np.uint64)
    got_bits = np.unpackbits(got.view(np.uint8), bitorder="little")[:64].astype(bool)
    assert (got_bits == want_bits).all()


def test_adaptive_ann_search_small_base(spark):
    from rabitq_spark.operators.ann import ann_search

    base = _random_table(spark, 150, 64, seed=9)
    queries = base.filter("id < 3").select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    got = ann_search(queries, base, 3).toPandas().sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    want = knn_exact(queries, base, 3).toPandas().sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    pd.testing.assert_frame_equal(got, want, check_exact=True)

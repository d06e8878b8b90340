"""Block-diagonal rotation: the dim > 2048 path. Orthogonality (norm
preservation), dense/block agreement under the dispatch helpers, and the
strongest end-to-end invariant — a high-dim build + exhaustive search still
equals brute force bit-for-bit, through a save/load round-trip."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from rabitq_spark.config import RaBitQConfig
from rabitq_spark.index import RaBitQModel, build_index, search
from rabitq_spark.index.build import gen_rotation
from rabitq_spark.index.rotation import BlockRotation, apply_rot, apply_rot_T
from rabitq_spark.operators.knn import knn_exact

DIM = 2176  # > MAX_DENSE_ROT_DIM -> blocks of 2048 + 128


def test_gen_rotation_dispatch_and_orthogonality():
    dense = gen_rotation(64, seed=1)
    assert isinstance(dense, np.ndarray)
    blocked = gen_rotation(DIM, seed=1)
    assert isinstance(blocked, BlockRotation)
    assert [b.shape[0] for b in blocked.blocks] == [2048, 128]
    x = np.random.default_rng(3).standard_normal((5, DIM)).astype(np.float32)
    y = apply_rot(x, blocked)
    # orthogonal: norms preserved (float32 tolerance)
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=1), np.linalg.norm(x, axis=1), rtol=1e-4
    )
    # apply_T inverts apply
    np.testing.assert_allclose(apply_rot_T(y, blocked), x, atol=1e-3)


def test_highdim_build_exhaustive_equals_bruteforce(spark, tmp_path):
    rng = np.random.default_rng(11)
    n = 60
    vecs = rng.standard_normal((n, DIM)).astype(np.float32)
    pdf = pd.DataFrame({"id": np.arange(n), "vec": list(vecs)})
    base = spark.createDataFrame(pdf, "id bigint, vec array<float>")
    queries = spark.createDataFrame(
        pdf.head(4).rename(columns={"id": "query_id", "vec": "qvec"}),
        "query_id bigint, qvec array<float>",
    )
    model = build_index(base, RaBitQConfig(n_clusters=4, topk=5))
    assert isinstance(model.rotation, BlockRotation)

    exact = knn_exact(queries, base, 5).toPandas().sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    exh = search(
        model, queries, topk=5, nprobe=model.n_clusters, overfetch=10**6
    ).toPandas().sort_values(["query_id", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(exh, exact, check_exact=True)

    # persistence round-trip keeps the block rotation and the results
    path = str(tmp_path / "hd")
    model.save(path)
    loaded = RaBitQModel.load(spark, path)
    assert isinstance(loaded.rotation, BlockRotation)
    after = search(
        loaded, queries, topk=5, nprobe=loaded.n_clusters, overfetch=10**6
    ).toPandas().sort_values(["query_id", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(after, exact, check_exact=True)

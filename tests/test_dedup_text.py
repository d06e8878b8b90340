"""Dedup + text-analysis operators: semantic unit tests on tiny literal
inputs (the oracle harness covers engine-vs-DuckDB equivalence; these cover
intent)."""

import pytest
from pyspark.sql import functions as F

from rabitq_spark.functions.text import (
    jaccard,
    lang_guess,
    quality_score,
    simhash60,
    token_count,
    word_shingles,
)
from rabitq_spark.operators.dedup import (
    dedup_exact,
    embedding_neardup_pairs,
    neardup_minhash_pairs,
    simhash_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_word_shingles_and_jaccard(spark):
    df = _docs(spark, ["a b c d", "a b c e", "x"])
    out = df.select("doc_id", word_shingles("text", 3).alias("sh")).collect()
    by_id = {r.doc_id: set(r.sh) for r in out}
    assert by_id[0] == {"a b c", "b c d"}
    assert by_id[1] == {"a b c", "b c e"}
    assert by_id[2] == set()  # shorter than n -> empty, no crash

    j = (
        spark.createDataFrame([(["a", "b"], ["b", "c"])], "x array<string>, y array<string>")
        .select(jaccard("x", "y").alias("j"))
        .first()
        .j
    )
    assert j == pytest.approx(1 / 3)


def test_dedup_exact_canonicalizes_whitespace_and_case(spark):
    df = _docs(spark, ["Hello  World", "hello world", "other text"])
    out = {r.doc_id: r for r in dedup_exact(df).collect()}
    assert out[1].canonical_id == 0 and out[1].is_dup == 1
    assert out[0].canonical_id == 0 and out[0].is_dup == 0
    assert out[2].group_size == 1


def test_neardup_minhash_finds_near_but_not_far(spark):
    near_a = "the quick brown fox jumps over the lazy dog again and again today"
    near_b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    far = "completely different words having nothing in common with others here"
    df = _docs(spark, [near_a, near_b, far])
    pairs = neardup_minhash_pairs(df, threshold=0.5).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(0, 1)]
    assert pairs[0].jaccard > 0.5


def test_simhash_banding_equals_bruteforce(spark, sf_dir):
    # pigeonhole guarantee: banded candidate generation must reproduce the
    # naive all-pairs result exactly
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(docs, max_hamming=3).collect()
    }
    sims = docs.select("doc_id", simhash60("text").alias("s"))
    a, b = sims.alias("a"), sims.alias("b")
    naive = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.s").bitwiseXOR(F.col("b.s"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == naive


def test_embedding_neardup_symmetric_threshold(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.01]),   # nearly parallel to 0
        (2, [0.0, 1.0]),    # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    pairs = embedding_neardup_pairs(df, threshold=0.9).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(0, 1)]


def test_neardup_ngram_robust_to_char_edits(spark):
    """Char n-gram Jaccard catches a one-letter spelling variant that
    3-word shingles would score at ~0 for short docs."""
    from rabitq_spark.operators.dedup import neardup_ngram_pairs

    a = "internationalization conference proceedings archive"
    b = "internationalisation conference proceedings archive"  # s/z variant
    far = "entirely unrelated subject matter discussion"
    df = _docs(spark, [a, b, far])
    pairs = neardup_ngram_pairs(df, threshold=0.5).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(0, 1)]
    assert pairs[0].jaccard > 0.5


def test_winnow_guarantee_and_compression(spark):
    """Winnowing guarantee: two docs sharing a token run of length
    window + kgram − 1 (= 6 here) select at least one common fingerprint;
    and selection keeps far fewer than all k-gram hashes."""
    from rabitq_spark.operators.dedup import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"
    df = _docs(
        spark,
        [
            f"{shared} one two three four five six seven eight nine ten",
            f"completely different prefix tokens here {shared}",
            "no overlap with anything else at all whatsoever",
        ],
    )
    fps = winnow_fingerprints(df, kgram_words=3, window=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[0] & by_doc[1], "shared 6-token run must share a fingerprint"
    assert not (by_doc[0] & by_doc[2])
    # compression: doc 0 has 17 tokens -> 15 kgrams; winnowing keeps fewer
    assert len(by_doc[0]) < 15


def test_bpe_token_count_pieces(spark):
    from rabitq_spark.functions.text import bpe_token_count, token_count

    df = _docs(spark, ["hello world 42!"])
    row = df.select(
        token_count("text").alias("ws"), bpe_token_count("text").alias("bpe")
    ).first()
    assert row.ws == 3
    # pieces: hello | world | 4 | 2 | !
    assert row.bpe == 5


def test_simhash_includes_zero_token_docs(spark):
    """Zero-token documents carry sim = 0 (like simhash60 and the oracle's
    all-pairs scan), so two empty docs are a hamming-0 pair — plain explode
    used to drop them from the table entirely."""
    from rabitq_spark.functions.text import simhash_table

    df = _docs(spark, ["", "   ", "some real text content here"])
    sims = {r.doc_id: r.sim for r in simhash_table(df, "doc_id", "text").collect()}
    assert sims[0] == 0 and sims[1] == 0
    assert len(sims) == 3
    pairs = {(p.id_a, p.id_b) for p in simhash_pairs(df, max_hamming=3).collect()}
    assert (0, 1) in pairs


def test_dedup_cache_scope_is_bounded(spark, sf_dir):
    """Repeated minhash calls must not accumulate cached intermediates in
    executor storage: each invocation retires the previous one's caches."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    jsc = spark.sparkContext._jsc
    neardup_minhash_pairs(docs).count()
    n1 = jsc.getPersistentRDDs().size()
    neardup_minhash_pairs(docs).count()
    n2 = jsc.getPersistentRDDs().size()
    assert n2 <= n1


def test_embedding_neardup_blocked_path_no_driver_collect(spark, sf_dir, monkeypatch):
    """Above broadcast_max_rows the operator must dispatch to the IVF-blocked
    plan, which never collects the table to the driver: any toPandas() during
    plan construction fails this test."""
    from pyspark.sql import DataFrame

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def boom(self):
        raise AssertionError("blocked path must not collect the table to the driver")

    monkeypatch.setattr(DataFrame, "toPandas", boom)
    # row_count passed explicitly (fake "huge table") so dispatch picks the
    # blocked plan without a count job
    df = embedding_neardup_pairs(
        emb, threshold=0.4, broadcast_max_rows=1000, row_count=10_000_000
    )
    assert "cosine" in df.columns  # plan constructed without any toPandas


def test_embedding_neardup_blocked_equals_broadcast(spark, sf_dir):
    """With exhaustive search settings and k_per_row ≥ |table|, the blocked
    path's candidate stage is complete, so its output must equal the exact
    broadcast-GEMM path bit-for-bit."""
    import pandas as pd

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    exact = (
        embedding_neardup_pairs(emb, threshold=0.4)
        .toPandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    blocked = (
        embedding_neardup_pairs(
            emb,
            threshold=0.4,
            broadcast_max_rows=1,      # force the blocked path
            row_count=n,
            k_per_row=n,               # candidate stage complete
            nprobe=10**6,              # clamped to n_clusters → exhaustive
            overfetch=10**6,
        )
        .toPandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(blocked, exact, check_exact=True)


def test_similarity_join_blocked_exhaustive_equals_single_block(spark, sf_dir):
    """Chunking the exhaustive left side into hash blocks must not change the
    result: per-query top-k is independent across queries."""
    import pandas as pd
    from pyspark.sql import functions as F

    from rabitq_spark.operators.simjoin import similarity_join

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    left = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    single = (
        similarity_join(left, left, k=3, exhaustive=True)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    blocked = (
        similarity_join(left, left, k=3, exhaustive=True, max_query_block=16)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(blocked, single, check_exact=True)


def test_connected_components_chain_triangle_isolated(spark):
    """Min-label propagation must produce exact components: a 5-node chain
    (diameter > 1 round — exercises iteration), a triangle, an isolated
    node."""
    from rabitq_spark.operators.graph import connected_components, neardup_groups

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12)],
        "id_a bigint, id_b bigint",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 5, 10, 11, 12, 99]], "doc_id bigint"
    )
    comp = {
        r.node: r.comp
        for r in connected_components(edges, nodes, node="doc_id").collect()
    }
    assert all(comp[i] == 1 for i in [1, 2, 3, 4, 5])
    assert all(comp[i] == 10 for i in [10, 11, 12])
    assert comp[99] == 99

    groups = {r.doc_id: r for r in neardup_groups(nodes, edges).collect()}
    assert groups[5].group_id == 1 and groups[5].is_dup == 1
    assert groups[1].is_dup == 0 and groups[1].group_size == 5
    assert groups[99].group_size == 1


def test_quality_and_lang_are_deterministic(spark):
    df = _docs(spark, ["the cat sat on the mat", "der hund und die katze nicht"])
    rows = df.select(
        "doc_id",
        token_count("text").alias("n"),
        quality_score("text").alias("q"),
        lang_guess("text").alias("lang"),
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[0].n == 6 and by_id[0].lang == "en"
    assert by_id[1].lang == "de"
    assert 0.0 <= by_id[0].q <= 1.0


def test_embedding_neardup_byte_budget_dispatch(spark, monkeypatch):
    """Dispatch is a BYTE budget, not a row count (round-2 verdict): at
    dim=1024, a table of only 64 rows must take the blocked path once
    rows x dim x 8 exceeds broadcast_max_bytes — row counts this small would
    have been collected under the old 1M-row default."""
    import numpy as np

    import rabitq_spark.operators.dedup as dedup_mod

    n, dim = 64, 1024
    rng = np.random.default_rng(0)
    emb = spark.createDataFrame(
        [(i, rng.standard_normal(dim).astype("float32").tolist()) for i in range(n)],
        "vec_id bigint, embedding array<float>",
    )
    called = []

    def fake_blocked(*args, **kwargs):
        called.append(True)
        return emb.selectExpr(
            "vec_id AS id_a", "vec_id AS id_b", "CAST(1.0 AS DOUBLE) AS cosine"
        ).limit(0)

    monkeypatch.setattr(dedup_mod, "_embedding_neardup_blocked", fake_blocked)
    # 64 rows x 1024 dim x 8 B = 512 KiB > 256 KiB budget -> blocked path
    dedup_mod.embedding_neardup_pairs(
        emb, threshold=0.9, broadcast_max_bytes=256 << 10
    )
    assert called, "byte budget exceeded but blocked path not taken"
    # the default 64 MiB budget keeps the same table on the exact GEMM path
    called.clear()
    df = dedup_mod.embedding_neardup_pairs(emb, threshold=0.9)
    assert not called
    assert "cosine" in df.columns


def test_release_caches_drains_text_generations(spark, sf_dir):
    """After the terminal action, release_caches() must leave no dedup cache
    generation pinned in executor storage (round-2 verdict: the final
    generation used to stay until another dedup call happened)."""
    from rabitq_spark.operators import dedup
    from rabitq_spark.operators.dedup import (
        neardup_ngram_pairs,
        release_caches,
        winnow_fingerprints,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    jsc = spark.sparkContext._jsc

    def persistent_ids():
        # RDD-id SET, not size: the ContextCleaner concurrently retires other
        # tests' checkpoint RDDs, so absolute counts race
        return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}

    before = persistent_ids()
    neardup_minhash_pairs(docs).count()
    neardup_ngram_pairs(docs).count()
    simhash_pairs(docs).count()
    winnow_fingerprints(docs).count()
    created = persistent_ids() - before
    assert created  # generations live
    release_caches()
    assert not dedup._SCOPES
    assert not (persistent_ids() & created)


def test_release_caches_drains_blocked_embedding_index(spark, sf_dir):
    """The blocked path's index cache is scope-registered: release_caches()
    (or the next invocation) unpersists it — round-2 verdict: it leaked."""
    from rabitq_spark.operators import dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    dedup.embedding_neardup_pairs(
        emb, threshold=0.4, broadcast_max_rows=1, row_count=50, k_per_row=5
    ).count()
    scope = dedup._SCOPES.get("embedding_blocked")
    assert scope and scope[0].storageLevel.useMemory
    dedup.release_caches()
    assert not dedup._SCOPES
    assert not scope[0].storageLevel.useMemory


def test_connected_components_raises_when_unconverged(spark):
    """A component with diameter > max_iter must raise, not silently return
    wrong labels (advisor, round 2): min-label propagation moves the label
    one hop per round, so a 10-edge chain cannot converge in 2 rounds."""
    from rabitq_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a bigint, id_b bigint"
    )
    nodes = spark.createDataFrame([(i,) for i in range(11)], "doc_id bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, nodes, max_iter=2)


def test_probe_broadcast_gate_is_byte_aware():
    """The probe-broadcast decision prices BYTES (dim × nprobe × codes),
    not row count (round-6: a fixed 500k-row cutoff broadcast ~1.7 GB at
    200k × 64 × nprobe=12 and OOMed an 8 GB heap)."""
    from rabitq_spark.operators.dedup import _probe_broadcast_ok

    # unknown row count (streaming caller): historical default = broadcast
    assert _probe_broadcast_ok(None, 64, 12, 4)
    # small table: broadcast fine
    assert _probe_broadcast_ok(10_000, 64, 12, 4)
    # the OOM shape: 200k rows x 64 dims x nprobe 12 -> far past 128 MB
    assert not _probe_broadcast_ok(200_000, 64, 12, 4)
    # same rows, tiny nprobe and dim: back under the cap
    assert _probe_broadcast_ok(200_000, 8, 1, 1, max_bytes=128 << 20) == (
        200_000 * 1 * (8 * 8 + (8 * 1 + 7) // 8 + 96) <= 128 << 20
    )
    # widening any factor flips the decision monotonically
    assert _probe_broadcast_ok(100_000, 64, 2, 1)
    assert not _probe_broadcast_ok(100_000, 1024, 2, 1, max_bytes=1 << 20)

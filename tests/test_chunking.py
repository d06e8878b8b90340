"""Chunking + deterministic hash split semantics."""

from pyspark.sql import functions as F

from rabitq_spark.operators.chunking import chunk_documents, hash_split


def test_chunk_windows_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(80))  # 80 tokens
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    out = chunk_documents(df, chunk_tokens=32, overlap=8).collect()
    # stride 24: chunks at 0, 24, 48 -> token 80 not covered by 48+32=80 ✓
    assert [r.chunk_no for r in out] == [0, 1, 2]
    assert out[0].n_chunk_tokens == 32 and out[2].n_chunk_tokens == 32
    toks0 = out[0].chunk_text.split(" ")
    toks1 = out[1].chunk_text.split(" ")
    assert toks0[24:] == toks1[:8]  # overlap shared
    assert toks0[0] == "t0" and toks1[0] == "t24"


def test_chunk_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    out = chunk_documents(df, chunk_tokens=32, overlap=8).collect()
    assert len(out) == 1
    assert out[0].chunk_text == "a b c" and out[0].n_chunk_tokens == 3


def test_hash_split_deterministic_and_proportional(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    a = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    b = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    assert a == b  # reproducible
    n = len(a)
    train = sum(1 for v in a.values() if v == "train")
    assert 0.7 <= train / n <= 0.9  # roughly 80%
    # different salt -> different assignment (not a constant function)
    c = {r.doc_id: r.split for r in hash_split(docs, "doc_id", salt="other").collect()}
    assert c != a


def test_stratified_sample_deterministic_and_rate_bounded(spark, sf_dir):
    from rabitq_spark.operators.chunking import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    kw = dict(strata_col="lang", id_col="doc_id", rates={"en": 0.5}, default_rate=0.1)
    a = {r.doc_id for r in stratified_sample(docs, **kw).collect()}
    b = {r.doc_id for r in stratified_sample(docs.repartition(7), **kw).collect()}
    assert a == b, "sample must be partitioning-independent"
    n_en = docs.filter("lang = 'en'").count()
    k_en = stratified_sample(docs, **kw).filter("lang = 'en'").count()
    # md5 buckets are uniform: expect ~0.5 within a generous band
    assert 0.3 * n_en <= k_en <= 0.7 * n_en, (k_en, n_en)


def test_concat_chunk_pack_invariants(spark, sf_dir):
    """Concat-and-chunk packing must tile the concatenated token stream
    exactly: every sequence except the last holds exactly seq_len tokens,
    each document's spans partition [0, n_tok) in order, and the result is
    partitioning-independent (the two-level prefix scan is a pure function
    of the data)."""
    from pyspark.sql import functions as F

    from rabitq_spark.operators.chunking import concat_chunk_pack

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    S = 64
    out = concat_chunk_pack(docs, seq_len=S).toPandas()
    total = int(
        docs.select(
            F.sum(F.size(F.filter(F.split("text", " "), lambda x: x != "")))
        ).first()[0]
    )
    # sequences tile the stream: seq s covers exactly [s*S, min((s+1)*S, total))
    per_seq = out.groupby("seq_id").agg(
        lo=("span_start", "min"), hi=("span_end", "max"),
    )
    covered = (out["span_end"] - out["span_start"]).sum()
    assert covered == total
    n_seqs = (total + S - 1) // S
    assert sorted(per_seq.index) == list(range(n_seqs))
    for s, row in per_seq.iterrows():
        assert row["lo"] == s * S
        assert row["hi"] == min((s + 1) * S, total)
    # per-doc spans are contiguous and ordered
    for doc_id, grp in out.sort_values(["doc_id", "seq_id"]).groupby("doc_id"):
        offs = grp["doc_off"].tolist()
        lens = (grp["span_end"] - grp["span_start"]).tolist()
        assert offs[0] == 0
        for k in range(1, len(offs)):
            assert offs[k] == offs[k - 1] + lens[k - 1]
    # partitioning independence
    out2 = (
        concat_chunk_pack(docs.repartition(7), seq_len=S)
        .toPandas()
        .sort_values(["doc_id", "seq_id"], ignore_index=True)
    )
    out1 = out.sort_values(["doc_id", "seq_id"], ignore_index=True)
    assert out1.equals(out2)


def test_shuffle_shards_invariants(spark, sf_dir):
    """Deterministic global shuffle: positions are dense 1..|shard| within
    each shard, shard sizes are near-uniform (md5 buckets), the result is
    partitioning-independent, and the within-shard order is decorrelated
    from doc_id order (it IS a shuffle, not a sort)."""
    from rabitq_spark.operators.chunking import shuffle_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    out = shuffle_shards(docs, n_shards=8).toPandas()
    assert len(out) == n
    sizes = out.groupby("shard_id").size()
    assert sorted(sizes.index) == list(range(8))
    assert sizes.min() >= 0.5 * n / 8 and sizes.max() <= 1.5 * n / 8
    for _, grp in out.groupby("shard_id"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
    # partitioning independence
    out2 = (
        shuffle_shards(docs.repartition(7), n_shards=8)
        .toPandas()
        .sort_values(["shard_id", "pos"], ignore_index=True)
    )
    assert out.sort_values(["shard_id", "pos"], ignore_index=True).equals(out2)
    # decorrelated from id order: rank correlation of (pos, doc_id) within
    # a shard should be far from 1 (md5 order is pseudo-random). Spearman
    # by hand (rank + Pearson) — scipy is not in this container.
    g0 = out[out["shard_id"] == 0]
    corr = g0["doc_id"].rank().corr(g0["pos"].rank())
    assert abs(corr) < 0.5, corr

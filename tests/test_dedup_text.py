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

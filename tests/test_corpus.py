"""Corpus-quality operator tests: repetition filters, contamination,
BM25, TF-IDF, sequence packing. Oracle parity is covered by
scripts/check_correctness.py / the driver harness; these tests pin the
SEMANTICS on hand-computable inputs and the partitioning-independence
contracts."""

import hashlib

import pytest
from pyspark.sql import functions as F

from rabitq_spark.operators.chunking import pack_sequences
from rabitq_spark.operators.corpus import (
    bm25_scores,
    contamination_check,
    repetition_stats,
    tfidf_top_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_hand_computed(spark):
    docs = _docs(
        spark,
        [
            (1, "a a a a"),          # one token repeated: top frac 1, all grams dup
            (2, "a b c d"),          # no repetition at all
            (3, ""),                  # empty doc
            (4, "x y x y x y"),      # alternating: distinct 2-grams = 2 of 5
        ],
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}

    assert out[1]["n_tok"] == 4
    assert out[1]["top_token"] == "a"
    assert out[1]["top_token_frac"] == 1.0
    # 3 total 2-grams, 1 distinct -> 2/3 duplicated
    assert out[1]["dup_2gram_frac"] == pytest.approx(2 / 3)
    assert out[1]["keep"] == 0

    assert out[2]["top_token_frac"] == 0.25
    assert out[2]["dup_2gram_frac"] == 0.0
    assert out[2]["dup_3gram_frac"] == 0.0

    assert out[3]["n_tok"] == 0
    assert out[3]["top_token"] == ""
    assert out[3]["top_token_frac"] == 0.0
    assert out[3]["keep"] == 1  # vacuously clean

    # x y x y x y: 5 2-grams, 2 distinct ("x y", "y x") -> 3/5
    assert out[4]["dup_2gram_frac"] == pytest.approx(3 / 5)
    # ties between x and y (3 each) break to lexicographically smaller
    assert out[4]["top_token"] == "x"


def _bucket(doc_id: int, salt: str = "contam-v1") -> int:
    return int(hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()[:8], 16) % 100


def test_contamination_check_full_and_zero_overlap(spark):
    # pick ids deterministically on each side of the 90% split
    train_ids = [i for i in range(200) if _bucket(i) < 90]
    test_ids = [i for i in range(200) if _bucket(i) >= 90]
    assert len(train_ids) >= 2 and len(test_ids) >= 2

    shared = " ".join(f"w{j}" for j in range(12))  # 12 tokens -> 5 8-grams
    unique = " ".join(f"u{j}" for j in range(12))
    short = "only three tokens"
    rows = [
        (train_ids[0], shared),
        (train_ids[1], "filler text with other words entirely different here"),
        (test_ids[0], shared),   # fully contained in train
        (test_ids[1], unique),   # zero overlap
        (test_ids[2] if len(test_ids) > 2 else test_ids[1] + 1000, short),
    ]
    # the short doc's id must still be a test id if we synthesized one
    rows = [r for r in rows if r[0] in train_ids or _bucket(r[0]) >= 90]
    out = {
        r["doc_id"]: r
        for r in contamination_check(_docs(spark, rows)).collect()
    }

    assert out[test_ids[0]]["contamination_frac"] == 1.0
    assert out[test_ids[0]]["n_grams"] == 5
    assert out[test_ids[1]]["contamination_frac"] == 0.0
    # short doc: no 8-grams, still present at frac 0
    short_id = rows[-1][0]
    if short_id != test_ids[1]:
        assert out[short_id]["n_grams"] == 0
        assert out[short_id]["contamination_frac"] == 0.0
    # train docs never appear
    assert train_ids[0] not in out


def test_bm25_orders_by_term_mass_at_equal_length(spark):
    filler = " ".join(f"f{i}" for i in range(7))
    docs = _docs(
        spark,
        [
            (1, "q q q " + filler),            # tf 3
            (2, "q q z " + filler),            # tf 2
            (3, "q z z " + filler),            # tf 1
            (4, "z z z " + filler),            # tf 0
            (5, "other words only here now a b c d e f"),
        ],
    )
    out = bm25_scores(docs, ["q"], k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert ids == [1, 2, 3]  # descending tf at equal dl; no zero-score rows
    scores = [r["score"] for r in out]
    assert scores[0] > scores[1] > scores[2] > 0
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_bm25_length_normalization(spark):
    # same tf, longer doc scores lower
    docs = _docs(
        spark,
        [
            (1, "q " + " ".join(f"f{i}" for i in range(4))),
            (2, "q " + " ".join(f"g{i}" for i in range(40))),
        ],
    )
    out = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["q"]).collect()}
    assert out[1] > out[2]


def test_tfidf_prefers_group_specific_terms(spark):
    rows = [
        (1, "en", "common alpha alpha alpha"),
        (2, "en", "common alpha beta"),
        (3, "de", "common gamma gamma gamma"),
        (4, "de", "common gamma delta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = tfidf_top_terms(docs, "lang", k=1).collect()
    best = {r["lang"]: r["token"] for r in out}
    # 'common' appears in every doc (df=4) so the group-specific term wins
    assert best == {"en": "alpha", "de": "gamma"}


def test_pack_sequences_budget_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pack_sequences(docs, budget=512, n_shards=8).collect()
    assert len(out) == docs.count()

    by_bin: dict[tuple, list] = {}
    for r in out:
        by_bin.setdefault((r["shard"], r["bin_id"]), []).append(r)
    for (shard, bin_id), members in by_bin.items():
        total = sum(m["n_tok"] for m in members)
        # a bin is over budget only when a single oversized doc owns it
        assert total <= 512 or len(members) == 1
    # bins are contiguous from 0 per shard
    for shard in {r["shard"] for r in out}:
        bins = sorted({r["bin_id"] for r in out if r["shard"] == shard})
        assert bins == list(range(len(bins)))

    # partitioning-independence: same assignment from a repartitioned input
    out2 = pack_sequences(docs.repartition(7), budget=512, n_shards=8).collect()
    key = lambda rows: sorted((r["doc_id"], r["shard"], r["bin_id"]) for r in rows)
    assert key(out) == key(out2)


def test_pack_sequences_next_fit_hand_case(spark):
    # shard 0 only: ids 0,8,16,24 with controlled token counts
    texts = {0: 300, 8: 200, 16: 100, 24: 500}
    rows = [(i, " ".join(["t"] * n)) for i, n in texts.items()]
    out = {
        r["doc_id"]: r["bin_id"]
        for r in pack_sequences(_docs(spark, rows), budget=512, n_shards=8).collect()
    }
    # 300 -> bin0 (fill 300); 200 -> fits (500); 100 -> overflow -> bin1;
    # 500 -> overflow -> bin2
    assert out == {0: 0, 8: 0, 16: 1, 24: 2}


def test_hybrid_rrf_fusion_semantics(spark):
    from rabitq_spark.operators.corpus import hybrid_rrf

    text = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    vec = spark.createDataFrame(
        [(3, 1), (4, 2)], "doc_id long, rank int"
    )
    got = {r["doc_id"]: r for r in hybrid_rrf(text, vec, k_rrf=60, topn=10).collect()}
    # doc 3 appears in both lists: 1/63 + 1/61 — must outrank everything
    assert got[3]["rank"] == 1
    assert abs(got[3]["rrf_score"] - (1 / 63 + 1 / 61)) < 1e-15
    # single-list docs score only their own contribution
    assert abs(got[1]["rrf_score"] - 1 / 61) < 1e-15
    assert abs(got[4]["rrf_score"] - 1 / 62) < 1e-15
    # deterministic ordering: 3 (both), then 1 (1/61), 4 (1/62), 2 (1/62)?
    # 1/62 tie between 4 and... no: doc 2 is 1/62, doc 4 is 1/62 -> tie
    # broken by doc_id ascending
    ranks = {d: r["rank"] for d, r in got.items()}
    assert ranks == {3: 1, 1: 2, 2: 3, 4: 4}


def test_bigram_coherence_flags_shuffled_text(spark):
    """A document following the corpus's dominant transitions scores
    higher than a token-shuffled document over the same vocabulary."""
    from rabitq_spark.operators.corpus import bigram_coherence

    corpus = [(i, "alpha beta gamma delta") for i in range(10)]
    corpus.append((10, "alpha beta gamma delta"))  # fluent doc
    corpus.append((11, "delta beta alpha gamma"))  # shuffled doc
    corpus.append((12, "solo"))  # < 2 tokens -> zeros
    rows = {r.doc_id: r for r in bigram_coherence(_docs(spark, corpus)).collect()}
    assert rows[10].coherence > rows[11].coherence
    assert rows[12].n_bigrams == 0 and rows[12].coherence == 0.0
    # fluent doc: every transition is the corpus majority -> near 1
    assert rows[10].coherence > 0.9
    # hand check: pair_support sums per-position corpus bigram counts
    assert rows[10].pair_support >= 3 * 11  # 3 transitions, each seen 12x... >= lower bound

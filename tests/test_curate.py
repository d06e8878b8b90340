"""Curation operator semantics: DF-window vocabulary pruning with order
preservation, decontamination filtering, cross-corpus near-dup equivalence
to the self-join restricted across the split, and the keep/drop verdict's
reason priority."""

import pytest
from pyspark.sql import functions as F

from rabitq_spark.operators.curate import (
    curate_corpus,
    decontaminate,
    token_df_prune,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_df_prune_window_and_order(spark):
    # 'common' in all 4 docs (df=4 > 0.75*4 = 3), 'rare' in 1 (df=1 < 2):
    # both pruned; alpha/beta (df=3) survive in original order
    docs = _docs(
        spark,
        [
            (0, "common alpha beta rare"),
            (1, "common beta alpha"),
            (2, "common alpha"),
            (3, "common beta"),
        ],
    )
    got = {
        r["doc_id"]: r
        for r in token_df_prune(docs, min_df=2, max_df_frac=0.75).collect()
    }
    assert got[0]["text_pruned"] == "alpha beta"
    assert got[1]["text_pruned"] == "beta alpha"  # original order, not sorted
    assert got[0]["n_tok_orig"] == 4 and got[0]["n_tok_kept"] == 2
    # doc whose every token is pruned survives with empty text
    solo = _docs(spark, [(7, "xyzzy")])
    all_docs = docs.unionByName(solo)
    got7 = {
        r["doc_id"]: r
        for r in token_df_prune(all_docs, min_df=2, max_df_frac=0.75).collect()
    }[7]
    assert got7["text_pruned"] == "" and got7["n_tok_kept"] == 0
    assert got7["n_tok_orig"] == 1


def test_decontaminate_drops_exactly_overlapping_docs(spark):
    ev = _docs(spark, [(100, "one two three four tail")])
    train = _docs(
        spark,
        [
            (0, "one two three four something"),  # shares a 4-gram -> dropped
            (1, "two three four five six"),  # no shared 4-gram window
            (2, "totally different words here now"),
        ],
    )
    kept = sorted(
        r["doc_id"] for r in decontaminate(train, ev, ngram=4).collect()
    )
    assert kept == [1, 2]
    # all original columns survive
    assert decontaminate(train, ev, ngram=4).columns == ["doc_id", "text"]


def test_curate_reason_priority(spark):
    rep_text = "spam " * 40  # top_token_frac 1.0 -> repetitive
    docs = _docs(
        spark,
        [
            (0, "quick brown foxes jump over lazy sleeping dogs near riverside banks while curious children watch quietly from wooden bridges above"),
            (1, rep_text.strip()),  # repetitive
            (2, "tiny"),  # low quality (short, but not repetitive-flagged?)
            (3, rep_text.strip()),  # exact dup of 1 -> duplicate wins over repetitive
            (4, "held out gram match here padded with more distinct tokens"),
        ],
    )
    ev = _docs(spark, [(9, "held out gram match elsewhere")])
    got = {r["doc_id"]: r["reason"] for r in curate_corpus(docs, ev).collect()}
    assert got[3] == "duplicate"  # dup of doc 1, not canonical
    assert got[1] == "repetitive"  # canonical survivor, flagged repetitive
    assert got[4] == "contaminated"  # shares 'held out gram match'
    assert got[0] == "kept"
    # doc 2: single token -> top_token_frac 1.0 -> repetitive outranks low_quality
    assert got[2] == "repetitive"
    keeps = {r["doc_id"]: r["keep"] for r in curate_corpus(docs, ev).collect()}
    assert keeps == {0: 1, 1: 0, 2: 0, 3: 0, 4: 0}


def test_curate_without_eval_set_skips_contamination(spark):
    docs = _docs(spark, [(0, "a perfectly ordinary document with many distinct tokens here")])
    got = curate_corpus(docs, None).collect()
    assert got[0]["reason"] in ("kept", "low_quality")  # no contaminated path


def test_cross_pairs_equal_selfjoin_across_split(spark, sf_dir):
    from rabitq_spark.operators.dedup import (
        neardup_minhash_pairs,
        neardup_minhash_pairs_cross,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    srcn = F.substring(F.col("source"), 4, 10).cast("int")
    a, b = docs.filter(srcn < 10), docs.filter(srcn >= 10)
    cross = {
        (r["id_a"], r["id_b"])
        for r in neardup_minhash_pairs_cross(a, b).collect()
    }
    # oracle: self-join over the full corpus, restricted to pairs that
    # straddle the split (self-join orders by id; re-orient to (a-side, b-side))
    side = {
        r["doc_id"]: r["sn"]
        for r in docs.select("doc_id", srcn.alias("sn")).collect()
    }
    want = set()
    for r in neardup_minhash_pairs(docs).collect():
        x, y = r["id_a"], r["id_b"]
        if (side[x] < 10) != (side[y] < 10):
            want.add((x, y) if side[x] < 10 else (y, x))
    assert cross == want


def test_quality_filter_drops_bottom_decile_partition_independent(spark, sf_dir):
    from rabitq_spark.operators.curate import quality_filter_quantile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = quality_filter_quantile(docs, keep_frac=0.9)
    n = docs.count()
    k = kept.count()
    # drops AT MOST floor(0.1*n) (ties at the cut value are kept)
    assert n - k <= int(0.1 * n) + 1 and k < n or n < 10
    # partitioning-independent: same kept set from a different layout
    k2 = quality_filter_quantile(docs.repartition(13), keep_frac=0.9)
    assert {r["doc_id"] for r in kept.collect()} == {
        r["doc_id"] for r in k2.collect()
    }


def test_source_mix_upweights_small_sources(spark):
    from rabitq_spark.operators.curate import source_mix_sample

    rows = [(i, "big") for i in range(900)] + [
        (i + 1000, "small") for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    kept = source_mix_sample(docs, target_frac=0.5).groupBy("source").count()
    by = {r["source"]: r["count"] for r in kept.collect()}
    # sqrt weighting: rate_small/rate_big = sqrt(100)/sqrt(900) * 900/100 = 3
    # so the small source keeps ~3x the FRACTION the big one does
    frac_small = by.get("small", 0) / 100
    frac_big = by.get("big", 0) / 900
    assert frac_small > 1.5 * frac_big
    # deterministic across partitioning
    again = source_mix_sample(docs.repartition(7), target_frac=0.5)
    assert {r["doc_id"] for r in again.collect()} == {
        r["doc_id"]
        for r in source_mix_sample(docs, target_frac=0.5).collect()
    }


def test_dedup_keep_best_keeps_highest_quality_member(spark):
    """The kept member of each group is the argmax-quality doc (tie: min
    id); singleton groups always keep themselves."""
    from rabitq_spark.functions.text import quality_score
    from rabitq_spark.operators.curate import dedup_keep_best

    # quality rises with length saturation: doc 1 (longer) beats doc 0
    docs = _docs(
        spark,
        [
            (0, "shared words here okay fine"),
            (1, "shared words here okay fine plus extra richer vocabulary"),
            (2, "completely unrelated standalone document"),
        ],
    )
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    rows = {r.doc_id: r for r in dedup_keep_best(docs, pairs).collect()}
    assert rows[0].group_id == 0 and rows[1].group_id == 0
    assert (rows[0].keep, rows[1].keep) == (0, 1)  # best member wins, not min id
    assert rows[2].keep == 1 and rows[2].group_size == 1
    q = {
        r.doc_id: r.q
        for r in docs.select("doc_id", quality_score("text").alias("q")).collect()
    }
    assert q[1] > q[0]
    assert rows[1].quality == q[1]


def test_weighted_sample_respects_weights_and_determinism(spark):
    from rabitq_spark.operators.curate import weighted_sample

    rows = [(i, 1000 if i < 50 else 1) for i in range(1050)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample(df, k=100, weight_col="w")
    ids = {r.doc_id for r in got.collect()}
    assert len(ids) == 100
    # the 50 heavy rows (weight 1000 vs 1) virtually all make the sample
    heavy = sum(1 for i in ids if i < 50)
    assert heavy >= 45
    # partitioning-independence: same sample from a different layout
    ids2 = {r.doc_id for r in weighted_sample(df.repartition(7), 100, "w").collect()}
    assert ids == ids2
    # zero/negative weights never win
    df2 = spark.createDataFrame([(1, 0), (2, -3), (3, 5)], "doc_id long, w long")
    assert {r.doc_id for r in weighted_sample(df2, 3, "w").collect()} == {3}


def test_source_quota_caps_and_keeps_best(spark):
    from rabitq_spark.operators.curate import source_quota

    rows = [(i, "a" if i < 20 else "b", i * 10) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = source_quota(df, quota=5).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.source, []).append(r.doc_id)
    assert len(by_src["a"]) == 5 and len(by_src["b"]) == 5
    # keeps the LONGEST docs of the capped source
    assert sorted(by_src["a"]) == [15, 16, 17, 18, 19]


def test_oov_rate_hand_computed(spark):
    from rabitq_spark.operators.corpus import oov_rate

    docs = spark.createDataFrame(
        [
            (0, "en", "a a a b"),
            (1, "en", "a b c"),
            (2, "de", "x y a"),
        ],
        "doc_id long, lang string, text string",
    )
    # global counts: a=5, b=2, c=1, x=1, y=1 -> vocab_size=2 keeps {a, b}
    got = {r.lang: r for r in oov_rate(docs, vocab_size=2).collect()}
    assert got["en"].n_tokens == 7 and got["en"].n_oov == 1
    assert got["de"].n_tokens == 3 and got["de"].n_oov == 2
    assert abs(got["de"].oov_rate - 2 / 3) < 1e-15

"""Positional inverted index: phrase semantics (overlaps, 3-grams), and
index-plan == scan-plan equivalence."""

from rabitq_spark.operators.invindex import build_inverted_index, phrase_search


def _docs(spark):
    rows = [
        (0, "a a a b"),          # "a a" overlaps: 2 matches
        (1, "x y z x y z"),      # "x y z" twice
        (2, "x y"),              # prefix only — no "x y z"
        (3, "b a a"),            # "a a" once, not at pos 0
        (4, "q"),                # no phrase words at all
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_overlapping_matches_counted(spark):
    out = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(_docs(spark), "a a").collect()
    }
    assert out == {0: (2, 0), 3: (1, 1)}


def test_three_word_phrase(spark):
    out = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(_docs(spark), "x y z").collect()
    }
    assert out == {1: (2, 0)}


def test_index_plan_equals_scan_plan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = build_inverted_index(docs)
    via_scan = (
        phrase_search(docs, "table hash")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    via_index = (
        phrase_search(docs, "table hash", index=idx)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert via_scan.equals(via_index)
    assert len(via_scan) > 0


def test_index_df_counts(spark):
    idx = {r["token"]: r for r in build_inverted_index(_docs(spark)).collect()}
    assert idx["a"]["df"] == 2  # docs 0 and 3
    postings = {p["doc_id"]: list(p["positions"]) for p in idx["a"]["postings"]}
    assert postings == {0: [0, 1, 2], 3: [1, 2]}


def test_max_df_pruning_and_hybrid_phrase(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # tiny max_df: common corpus words get NULL postings, rare ones keep them
    idx = build_inverted_index(docs, max_df=50)
    sample = idx.select(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("postings").isNull(), 1)).alias("n_pruned"),
    ).first()
    assert sample["n_pruned"] > 0, "max_df=50 should prune common words"
    # hybrid phrase search (pruned words via scan) == pure scan plan
    via_scan = (
        phrase_search(docs, "table hash")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    via_hybrid = (
        phrase_search(docs, "table hash", index=idx)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert via_scan.equals(via_hybrid)
    assert len(via_scan) > 0

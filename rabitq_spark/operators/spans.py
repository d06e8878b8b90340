"""Exact repeated-substring (duplicate span) detection.

The exact-substring dedup signal of Lee et al., "Deduplicating Training
Data Makes Language Models Better" (arXiv:2107.06499): find every run of
>= k consecutive tokens that occurs in more than one document, and report
it as a merged [start, end) token span per document. The reference engine
has no text surface (SURVEY.md: vector search only) — this is north-star
LLM-pipeline territory, built on the same portable 60-bit hash family as
the winnowing fingerprints (functions/text.py::kgram_hash_seq).

Plan shape (scale-first):
  1. per-doc ORDERED k-gram hash sequence — pure codegen projection
  2. posexplode to (doc_id, pos, gram) — ~n_tokens rows per doc
  3. global duplicate grams: groupBy(gram) -> distinct-doc count >= min_docs
     (one keyed shuffle; map-side partial aggregation applies)
  4. join back on gram (second keyed shuffle) and merge each doc's
     overlapping duplicate k-gram positions into maximal spans with a
     gaps-and-islands window (third shuffle, by doc)
No all-pairs comparison anywhere: cost is O(total_tokens) rows through
three keyed shuffles, which survives a 1000-executor 100 TB corpus. A true
suffix-array (the paper's sequential construction) is not
distribution-friendly; the k-gram inverted index computes the identical
>=k-token duplicate coverage as long as k equals the paper's minimum match
length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _duplicate_gram_positions(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    min_docs: int,
) -> DataFrame:
    """(doc_id, pos) of every k-gram whose hash occurs in >= min_docs docs.

    The word-hash array is materialized behind a localCheckpoint-free
    barrier via the posexplode shuffle itself; the gram construction is a
    single projection so CollapseProject re-evaluation (PLAN.md pitfall #2)
    does not apply — each gram is built once per row by posexplode.
    """
    from rabitq_spark.functions.text import kgram_hash_seq, word_hashes
    from rabitq_spark.operators.dedup import _widen

    wh = _widen(docs).select(
        F.col(id_col).alias("doc_id"), word_hashes(F.col(text_col)).alias("h")
    ).localCheckpoint(eager=False)
    grams = wh.select(
        "doc_id",
        F.posexplode(kgram_hash_seq(F.col("h"), k)).alias("pos", "g"),
    ).withColumn("pos", F.col("pos").cast("bigint"))
    dup_g = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("g")
    )
    return grams.join(dup_g, "g").select("doc_id", "pos")


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Returns (doc_id, span_start, span_end, n_grams): token-index ranges
    [span_start, span_end) covered by k-grams that appear in >= min_docs
    documents, with overlapping/touching gram ranges merged (interval
    union via a running-max window). n_grams counts the duplicate k-gram
    starts inside the span. All-integer output — bit-exact across engines.
    """
    pos = _duplicate_gram_positions(docs, id_col, text_col, k, min_docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = pos.withColumn(
        "new_island",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select("doc_id", "span_start", "span_end", "n_grams")
    )


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Rewrite each document with its duplicated spans cut out — the
    exact-substring dedup transform of Lee et al. (arXiv:2107.06499 §4:
    remove each duplicated substring occurrence, keep the remainder).

    Returns (doc_id, clean_text, n_tokens_kept, n_tokens_removed).
    clean_text is the kept tokens re-joined by single spaces (the corpus
    delimiter), so a document with no duplicated span round-trips
    unchanged. The span side of the join is tiny (only documents with
    duplicates); the token filter is a pure codegen higher-order
    expression — per-doc cost O(tokens × spans), spans per doc being the
    handful of merged islands, never a per-token join."""
    from rabitq_spark.functions.text import tokens

    spans = (
        duplicate_spans(docs, id_col, text_col, k, min_docs)
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("spans")
        )
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")
    )
    joined = base.join(spans, "doc_id", "left").withColumn(
        "spans",
        F.coalesce(
            F.col("spans"),
            F.array().cast("array<struct<span_start:bigint,span_end:bigint>>"),
        ),
    )
    kept = F.filter(
        F.col("toks"),
        lambda t, i: ~F.exists(
            F.col("spans"),
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        ),
    )
    return joined.select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size(kept).cast("bigint").alias("n_tokens_kept"),
        (F.size("toks") - F.size(kept)).cast("bigint").alias("n_tokens_removed"),
    )


def dup_span_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicate-coverage profile (RefinedWeb-style signal).

    (doc_id, n_tokens, dup_tokens, dup_fraction): dup_tokens is the merged
    token coverage of all duplicated spans, dup_fraction the single IEEE
    division dup_tokens / n_tokens (identical across engines). Documents
    with no duplicated span appear with zeros — the common case, so the
    span side is the small side of the outer join.
    """
    from rabitq_spark.functions.text import token_count

    spans = duplicate_spans(docs, id_col, text_col, k, min_docs)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens")
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("bigint").alias("dup_tokens"),
        (
            F.coalesce(F.col("dup_tokens"), F.lit(0)) / F.col("n_tokens")
        ).alias("dup_fraction"),
    )

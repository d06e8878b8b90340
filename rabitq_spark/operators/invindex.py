"""Positional inverted index + phrase search — the text-retrieval sibling of
the vector index family (bm25_search ranks by term stats; this answers the
EXACT-phrase predicate those stats cannot).

Index build: one posexplode of the token array → (token, doc_id, positions),
postings sorted by doc id. The index is a DataFrame like every other index
in this engine — write it partitioned by token prefix and a phrase query
prunes to the probed tokens' partitions, the same S9/A2 pruning story as the
IVF posting lists.

Phrase search: positions of the first word filtered by "word i appears at
p+i" for every later word — a pure Column `F.filter` + `array_contains`
composition (whole-stage codegen, no UDF). Matching is token-level, so
overlapping occurrences count correctly ("a a a" contains "a a" twice —
substring oracles get this wrong, which is why the DuckDB oracle also works
on token positions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rabitq_spark.functions.text import tokens


def doc_token_positions(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, token) — one row per token occurrence."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(text_col)).alias("pos", "token"),
    )


def build_inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """(token, df, postings) where postings = sorted array of
    (doc_id, positions[]) structs. One shuffle keyed by token.

    `max_df` bounds the posting-list arrays at scale: a stopword's
    postings would otherwise be one array over the whole corpus (the
    unbounded-state trap of naive inverted indexes). Tokens with
    df > max_df keep their df but carry NULL postings — phrase_search
    detects them and derives their positions from the corpus scan instead
    (the right plan for common words anyway)."""
    per_doc = (
        doc_token_positions(docs, id_col, text_col)
        .groupBy("token", "doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("positions"))
    )
    if max_df is None:
        return per_doc.groupBy("token").agg(
            F.count(F.lit(1)).alias("df"),
            F.array_sort(F.collect_list(F.struct("doc_id", "positions"))).alias(
                "postings"
            ),
        )
    # prune BEFORE collecting (a when() after the agg would still build the
    # stopword's full array): df via a token window, then the collect only
    # runs over surviving rows. The window output is already partitioned by
    # token, so the groupBy adds no extra exchange.
    from pyspark.sql import Window

    tagged = per_doc.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("token"))
    )
    kept = (
        tagged.filter(F.col("df") <= max_df)
        .groupBy("token")
        .agg(
            F.first("df").alias("df"),
            F.array_sort(F.collect_list(F.struct("doc_id", "positions"))).alias(
                "postings"
            ),
        )
    )
    pruned = (
        tagged.filter(F.col("df") > max_df)
        .select("token", "df")
        .distinct()
        .withColumn(
            "postings",
            F.lit(None).cast(kept.schema["postings"].dataType),
        )
    )
    return kept.unionByName(pruned)


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    index: DataFrame | None = None,
) -> DataFrame:
    """Documents containing the exact token phrase: (doc_id, n_matches,
    first_pos), one row per matching document.

    With `index` (from build_inverted_index) the plan joins the phrase
    words' posting rows only — len(phrase) index lookups instead of a corpus
    scan. Without it, positions are derived inline from `docs` (one scan).
    Either way the position intersection is the same codegen expression.
    """
    words = [w for w in phrase.split(" ") if w]
    if not words:
        raise ValueError("empty phrase")
    overflow: set[str] = set()
    if index is not None:
        # words whose postings were max_df-pruned fall back to the corpus
        # scan (the hybrid stopword plan): len(words) rows collected, never
        # more
        overflow = {
            r["token"]
            for r in index.filter(
                F.col("token").isin(list(words)) & F.col("postings").isNull()
            )
            .select("token")
            .collect()
        }
    scan_positions = None
    if index is None or overflow:
        scan_positions = doc_token_positions(docs, id_col, text_col)

    def word_frame(i: int, w: str):
        if index is not None and w not in overflow:
            return (
                index.filter(F.col("token") == w)
                .select(F.explode("postings").alias("p"))
                .select(
                    F.col("p.doc_id").alias("doc_id"),
                    F.col("p.positions").alias(f"pos_{i}"),
                )
            )
        return (
            scan_positions.filter(F.col("token") == w)
            .groupBy("doc_id")
            .agg(F.array_sort(F.collect_list("pos")).alias(f"pos_{i}"))
        )

    exploded = [word_frame(i, w) for i, w in enumerate(words)]
    joined = exploded[0]
    for nxt in exploded[1:]:
        joined = joined.join(nxt, "doc_id")
    # closure factory, NOT `lambda p, i=i`: a two-parameter lambda is an
    # (element, index) lambda to PySpark and the default would silently bind
    # to the array index (the banding bug tests/test_text_banding.py guards)
    def _at_offset(i: int):
        return lambda p: F.array_contains(F.col(f"pos_{i}"), p + i)

    starts = F.col("pos_0")
    for i in range(1, len(words)):
        starts = F.filter(starts, _at_offset(i))
    return (
        joined.select("doc_id", starts.alias("__starts"))
        .filter(F.size("__starts") > 0)
        .select(
            "doc_id",
            F.size("__starts").alias("n_matches"),
            F.element_at("__starts", 1).alias("first_pos"),
        )
    )

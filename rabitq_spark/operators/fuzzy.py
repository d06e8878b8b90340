"""Edit-distance fuzzy matching (entity resolution / record linkage).

The reference engine matches vectors; a training-data pipeline also needs to
match STRINGS approximately — join product/customer/author tables across
sources whose keys differ by typos, dedup OCR'd titles, link records. The
all-pairs levenshtein join is O(n²); the scalable plan is SymSpell-style
deletion-neighborhood blocking (Garbe's symmetric-delete algorithm):

    levenshtein(a, b) <= d  =>  the <=d-deletion neighborhoods of a and b
                                intersect

(deleting the edited positions from both sides yields a common string), so
exploding each string into its deletion variants and equi-joining on the
variant key surfaces EVERY qualifying pair — completeness is guaranteed, not
probabilistic like MinHash banding. Candidates then verify with the exact
`levenshtein` (JVM codegen, integer — bit-exact vs any oracle).

Scale shape: explode ×(len choose <=d) -> one shuffle keyed by variant ->
per-key pairs -> distinct -> verify. Same (band, key) skeleton as the LSH
dedups (operators/dedup.py); no all-pairs stage anywhere. Long common
prefixes (e.g. "Customer#0000...") are fine — keys are whole variant
strings, so only true near-matches collide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_variants(col: F.Column, max_dist: int) -> F.Column:
    """All strings reachable from `col` by deleting up to `max_dist` chars
    (including the string itself), as a deduplicated array — pure codegen.

    One deletion round is  transform(sequence(1, len), i ->
    concat(substring(s, 1, i-1), substring(s, i+1, len)));  round k applies
    it to every round-(k-1) variant. Neighborhood size is O(len^d) — the
    documented cost of exactness; d > 2 is rejected (use MinHash banding for
    looser matching).
    """
    frontier = F.array(col)  # 0-deletion variants
    all_vars = frontier
    for _ in range(max_dist):
        frontier = F.array_distinct(
            F.flatten(
                F.transform(
                    frontier,
                    lambda s: F.when(
                        F.length(s) > 0,
                        F.transform(
                            F.sequence(F.lit(1), F.length(s)),
                            lambda i: F.concat(
                                F.substring(s, F.lit(1), i - 1),
                                s.substr(i + 1, F.length(s)),
                            ),
                        ),
                    ).otherwise(F.array()),
                )
            )
        )
        all_vars = F.array_distinct(F.concat(all_vars, frontier))
    return all_vars


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs (id_a < id_b, dist) with levenshtein(text_a, text_b) <=
    max_dist — exact result set via deletion-neighborhood blocking."""
    if not 1 <= max_dist <= 2:
        raise ValueError("max_dist must be 1 or 2 (explode cost is O(len^d))")
    from rabitq_spark.operators.dedup import _widen

    ids = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
    # widen first: variant generation is CPU-bound codegen and would
    # otherwise run on as many cores as the table has files (measured 489 s
    # -> ~20 s at sf1.0, PLAN.md round-3 part-8); keep ONLY (id, variant) in
    # the shuffle — texts re-attach after the distinct, so the widest stage
    # moves two longs + the key instead of two full strings
    keyed = _widen(ids).select(
        "id",
        F.explode(_deletion_variants(F.col("txt"), max_dist)).alias("variant"),
    )
    a = keyed.select(F.col("id").alias("id_a"), "variant")
    b = keyed.select(F.col("id").alias("id_b"), "variant")
    cand = (
        a.join(b, "variant")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ta = ids.select(F.col("id").alias("id_a"), F.col("txt").alias("__txt_a"))
    tb = ids.select(F.col("id").alias("id_b"), F.col("txt").alias("__txt_b"))
    # no explicit broadcast: AQE turns these into broadcast joins whenever
    # the name table fits, and falls back to shuffle joins when it doesn't
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("__txt_a", "__txt_b").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    max_dist: int = 1,
) -> DataFrame:
    """Cross-table fuzzy equi-join: (left_id, right_id, dist) for every pair
    with levenshtein <= max_dist. Same blocked plan as fuzzy_self_pairs; the
    variant key is the only shuffle key, so the big sides never cross-join."""
    if not 1 <= max_dist <= 2:
        raise ValueError("max_dist must be 1 or 2 (explode cost is O(len^d))")
    from rabitq_spark.operators.dedup import _widen

    la = left.select(F.col(left_id).alias("id_a"), F.col(left_text).alias("__txt_a"))
    rb = right.select(
        F.col(right_id).alias("id_b"), F.col(right_text).alias("__txt_b")
    )
    a = _widen(la).select(
        "id_a",
        F.explode(_deletion_variants(F.col("__txt_a"), max_dist)).alias("variant"),
    )
    b = _widen(rb).select(
        "id_b",
        F.explode(_deletion_variants(F.col("__txt_b"), max_dist)).alias("variant"),
    )
    cand = a.join(b, "variant").select("id_a", "id_b").distinct()
    return (
        cand.join(la, "id_a")
        .join(rb, "id_b")
        .select("id_a", "id_b", F.levenshtein("__txt_a", "__txt_b").alias("dist"))
        .filter(F.col("dist") <= max_dist)
    )

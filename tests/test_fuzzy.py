"""Fuzzy edit-distance matching (operators/fuzzy.py): the blocked
deletion-neighborhood plan must equal the naive all-pairs levenshtein join
exactly — completeness is a theorem (SymSpell), not a probability."""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from rabitq_spark.operators.fuzzy import fuzzy_join, fuzzy_self_pairs


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _random_words(n, seed):
    rng = np.random.default_rng(seed)
    alphabet = "abcde"
    words = []
    for _ in range(n):
        L = rng.integers(3, 9)
        words.append("".join(alphabet[i] for i in rng.integers(0, 5, L)))
    return words


@pytest.mark.parametrize("max_dist", [1, 2])
def test_self_pairs_equal_naive(spark, max_dist):
    words = _random_words(80, seed=7 + max_dist)
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id bigint, txt string"
    )
    got = (
        fuzzy_self_pairs(df, "id", "txt", max_dist)
        .toPandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    want = sorted(
        (i, j, _levenshtein(words[i], words[j]))
        for i, j in itertools.combinations(range(len(words)), 2)
        if _levenshtein(words[i], words[j]) <= max_dist
    )
    assert list(map(tuple, got[["id_a", "id_b", "dist"]].values)) == want


def test_cross_join_equal_naive(spark):
    left = _random_words(60, seed=3)
    right = _random_words(60, seed=4)
    ldf = spark.createDataFrame(
        [(i, w) for i, w in enumerate(left)], "lid bigint, ltxt string"
    )
    rdf = spark.createDataFrame(
        [(i, w) for i, w in enumerate(right)], "rid bigint, rtxt string"
    )
    got = (
        fuzzy_join(ldf, rdf, "lid", "ltxt", "rid", "rtxt", max_dist=1)
        .toPandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    want = sorted(
        (i, j, _levenshtein(left[i], right[j]))
        for i in range(len(left))
        for j in range(len(right))
        if _levenshtein(left[i], right[j]) <= 1
    )
    assert list(map(tuple, got[["id_a", "id_b", "dist"]].values)) == want


def test_self_pairs_duplicate_heavy_replicas(spark):
    """Round-11 distinct-text blocking: verbatim-duplicated texts (the
    key-offset-replica shape of the slope benchdata) must expand to every
    (id_a < id_b) pair exactly once — same-text groups (dist 0), cross-text
    near-matches across ALL replica combinations, non-contiguous ids."""
    base = ["abcde", "abcdx", "abcd", "zzzzz"]
    rows = [
        (rep * 1000 + i, w)  # replica ids are offset, not contiguous
        for rep in range(5)
        for i, w in enumerate(base)
    ]
    df = spark.createDataFrame(rows, "id bigint, txt string")
    got = (
        fuzzy_self_pairs(df, "id", "txt", max_dist=1)
        .toPandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    txt = dict(rows)
    want = sorted(
        (a, b, _levenshtein(txt[a], txt[b]))
        for a, b in itertools.combinations(sorted(txt), 2)
        if _levenshtein(txt[a], txt[b]) <= 1
    )
    assert list(map(tuple, got[["id_a", "id_b", "dist"]].values)) == want


def test_self_pairs_nonunique_id_no_self_rows(spark):
    """Round-12 ADVICE fix: one id carrying two distinct near-matching texts
    must not emit an id_a == id_b self row (the reproduced r11 case:
    [(1,'abc'),(1,'abd'),(2,'abe')] used to yield (1,1,1)). The surviving
    pairs are exactly the cross-ID matches."""
    df = spark.createDataFrame(
        [(1, "abc"), (1, "abd"), (2, "abe")], "id bigint, txt string"
    )
    got = (
        fuzzy_self_pairs(df, "id", "txt", max_dist=1)
        .toPandas()
        .sort_values(["id_a", "id_b", "dist"], ignore_index=True)
    )
    assert (got["id_a"] < got["id_b"]).all()
    # every (1, 2) text combination matches at dist 1 -> the pair appears
    # once per qualifying text pair of distinct ids
    assert set(map(tuple, got[["id_a", "id_b"]].values)) == {(1, 2)}


def test_rejects_wide_distance(spark):
    df = spark.createDataFrame([(1, "abc")], "id bigint, txt string")
    with pytest.raises(ValueError):
        fuzzy_self_pairs(df, "id", "txt", max_dist=3)


def test_empty_and_short_strings(spark):
    # deletion of a 1-char string reaches ""; "" matches 1-char strings at d=1
    df = spark.createDataFrame(
        [(0, ""), (1, "a"), (2, "b"), (3, "ab")], "id bigint, txt string"
    )
    got = (
        fuzzy_self_pairs(df, "id", "txt", 1)
        .toPandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    want = [(0, 1, 1), (0, 2, 1), (1, 2, 1), (1, 3, 1), (2, 3, 1)]
    assert list(map(tuple, got[["id_a", "id_b", "dist"]].values)) == want

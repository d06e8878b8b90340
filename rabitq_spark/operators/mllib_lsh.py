"""MLlib-backed LSH similarity joins — the library alternates to the
hand-rolled md5-minhash / IVF blocking (SURVEY.md §7 phase 6).

These wrap `pyspark.ml.feature.MinHashLSH` / `BucketedRandomProjectionLSH`
with `approxSimilarityJoin`. Their hash families are seeded but
implementation-defined, so no independent SQL can re-derive them — instead
they are oracle-checked via DETERMINISM PINS: for the pinned Spark/MLlib
version + fixed seeds the pair set and exact distances are bit-stable
(verified byte-identical across local[4]/shuffle=7 vs local[32]/shuffle=32
by scripts/check_lsh_stability.py), so the recorded output
(fixtures/{minhash_lsh,brp_lsh}_mllib_sf0.01.parquet, regenerate with
scripts/make_model_fixtures.py) serves as a drift-detecting regression
oracle. Semantic ground truth stays with the containment tests in
tests/test_mllib_lsh.py and the deterministic oracle-checked siblings in
operators/dedup.py. Both scale the MLlib way: hash tables are columns, the
join blocks on hash buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 3,
    num_hash_tables: int = 5,
    max_jaccard_distance: float = 0.2,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via MLlib MinHashLSH over shingle count-vectors.

    Returns (id_a, id_b, jaccard_distance) with id_a < id_b.
    """
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from rabitq_spark.functions.text import word_shingles

    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), shingle_words).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    cv = CountVectorizer(
        inputCol="shingles", outputCol="features", binary=True
    ).fit(sh)
    vec = cv.transform(sh)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    ).fit(vec)
    joined = lsh.approxSimilarityJoin(
        vec, vec, max_jaccard_distance, distCol="jaccard_distance"
    )
    return (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            "jaccard_distance",
        )
    )


def brp_lsh_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    max_l2_distance: float = 1.5,
    seed: int = 42,
) -> DataFrame:
    """Near-neighbor pairs via BucketedRandomProjectionLSH (euclidean).

    Returns (id_a, id_b, l2_distance) with id_a < id_b.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vec = embeddings.select(
        F.col(id_col).alias("vid"), array_to_vector(F.col(vec_col)).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(vec)
    joined = lsh.approxSimilarityJoin(vec, vec, max_l2_distance, distCol="l2_distance")
    return (
        joined.filter(F.col("datasetA.vid") < F.col("datasetB.vid"))
        .select(
            F.col("datasetA.vid").alias("id_a"),
            F.col("datasetB.vid").alias("id_b"),
            "l2_distance",
        )
    )

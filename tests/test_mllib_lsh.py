"""MLlib LSH containment checks (round-2 verdict: the two MLlib entries had
no correctness signal beyond row counts). The hash families are seeded but
implementation-defined, so no SQL oracle exists — instead we check
CONTAINMENT against ground truth the deterministic, oracle-checked operators
establish: every true pair at the threshold must appear in the MLlib
candidate output (the approximate join may only add sub-threshold noise it
then filters, never drop a true pair at these table sizes / hash counts)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_minhash_mllib_contains_deterministic_pairs(spark, docs):
    """MLlib MinHashLSH pairs at jaccard >= 0.8 must be a superset of the
    oracle-checked deterministic minhash pairs at the same threshold."""
    from rabitq_spark.operators.dedup import neardup_minhash_pairs, release_caches
    from rabitq_spark.operators.mllib_lsh import minhash_lsh_pairs

    det = {
        (r.id_a, r.id_b)
        for r in neardup_minhash_pairs(docs, threshold=0.8).collect()
    }
    release_caches()
    mllib = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, max_jaccard_distance=0.2).collect()
    }
    assert det, "fixture has no near-dup pairs; containment test is vacuous"
    missing = det - mllib
    assert not missing, f"MLlib missed true pairs: {sorted(missing)[:10]}"


def test_brp_mllib_contains_exact_l2_pairs(spark, emb):
    """BucketedRandomProjectionLSH is OR-amplified, so its recall depends on
    (bucket_length, num_hash_tables). Two pinned points, both measured on
    this fixture: at generous settings (bucket 8.0, 12 tables) the candidate
    set CONTAINS every exact pair at L2 <= 1.25 (5037 of them); at the
    operator defaults the documented floor is 0.93 recall — an honest LSH
    trade-off, not silent loss."""
    from rabitq_spark.functions.vector import l2_squared
    from rabitq_spark.operators.mllib_lsh import brp_lsh_pairs

    d = 1.25
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", l2_squared("va", "vb").alias("d2"))
        .filter(F.col("d2") <= d * d)
        .collect()
    }
    assert exact, "fixture has no close pairs; containment test is vacuous"
    full = {
        (r.id_a, r.id_b)
        for r in brp_lsh_pairs(
            emb, bucket_length=8.0, num_hash_tables=12, max_l2_distance=d
        ).collect()
    }
    missing = exact - full
    assert not missing, f"MLlib missed true pairs: {sorted(missing)[:10]}"
    default = {
        (r.id_a, r.id_b)
        for r in brp_lsh_pairs(emb, max_l2_distance=d).collect()
    }
    recall = 1.0 - len(exact - default) / len(exact)
    assert recall >= 0.9, f"default-settings recall degraded to {recall:.3f}"


def test_committed_lsh_fixtures_fresh(spark):
    """The committed determinism-pin fixtures
    (fixtures/{minhash_lsh,brp_lsh}_mllib_sf0.01.parquet) must equal a FRESH
    run of the registered queries over the sf0.01 corpus — catches a
    Spark/MLlib version bump (hash-family change), seed drift, or corpus
    drift that would silently stale the DuckDB oracle. Regenerate with
    scripts/make_model_fixtures.py after diagnosing any failure."""
    import os

    import pandas as pd
    import pytest

    from rabitq_spark.queries import q_brp_lsh_mllib, q_minhash_lsh_mllib

    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.01 testdata not present")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, fn in (
        ("minhash_lsh_mllib", q_minhash_lsh_mllib),
        ("brp_lsh_mllib", q_brp_lsh_mllib),
    ):
        fresh = fn(spark, sf_dir).toPandas()
        fresh = fresh.sort_values(by=list(fresh.columns), ignore_index=True)
        pinned = pd.read_parquet(
            os.path.join(repo, "fixtures", f"{name}_sf0.01.parquet")
        )
        pd.testing.assert_frame_equal(fresh, pinned, obj=name)

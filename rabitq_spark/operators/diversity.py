"""Embedding-space diversity sampling (training-data curation north star).

Uniform random sampling of a web-scale corpus oversamples its dense modes;
a diversity sample takes a bounded number of documents per REGION of
embedding space. Regions here are sign-random-projection (SimHash) buckets
— Charikar, STOC'02 — with hyperplane signs derived from md5 so the whole
operator is deterministic and bit-identical across engines (the sign
matrix is generated once in Python and inlined into BOTH the Spark plan
and the DuckDB oracle SQL).

Scale shape: one codegen projection per row (n_planes × dim multiply-adds,
no shuffle), then ONE shuffle keyed by bucket for the bounded per-bucket
pick (WindowGroupLimit pushes the top-n below the exchange). Bucket count
is 2^n_planes — pick n_planes so buckets ≫ executors and the per-bucket
cap bounds skew; no all-pairs distance anywhere, so the plan survives
100 TB.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hyperplane_signs(n_planes: int, dim: int, salt: str = "hp") -> list[list[float]]:
    """±1.0 sign matrix [n_planes][dim], derived from md5(salt|plane|dim) —
    the shared source of truth for the Spark plan and the oracle SQL."""
    out = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{salt}|{p}|{i}".encode()).hexdigest()
            row.append(1.0 if int(h[:8], 16) % 2 == 0 else -1.0)
        out.append(row)
    return out


def simhash_bucket(emb_col, signs: list[list[float]]):
    """Bucket id column: bit p = (emb · signs[p] >= 0), left-to-right IEEE
    fold per plane (mirrors the oracle's list_reduce exactly)."""
    bucket = F.lit(0).cast("bigint")
    for p, row in enumerate(signs):
        w = F.array(*[F.lit(v) for v in row])
        dot = F.aggregate(
            F.zip_with(emb_col, w, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bucket = bucket + F.when(dot >= 0.0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        ) * F.lit(1 << p).cast("bigint")
    return bucket


def embedding_diversity_sample(
    emb: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 6,
    per_bucket: int = 4,
    salt: str = "hp",
) -> DataFrame:
    """At most per_bucket vectors from each SimHash bucket of embedding
    space. Returns (vec_id, bucket, bucket_size, pick) — pick=1 rows are
    the diversity sample; the full assignment is kept so callers can also
    use the buckets as coverage statistics.

    The per-bucket choice ranks by md5(salt|vec_id) — a deterministic
    "random" order independent of partitioning, so the sample is
    reproducible on any cluster layout.
    """
    # sign matrix needs the (fixed) dimensionality: read it from the schema
    # if present, else from one row — never from a full scan
    dim = _embedding_dim(emb, emb_col)
    signs = hyperplane_signs(n_planes, dim, salt)
    w = Window.partitionBy("bucket").orderBy("pick_key", id_col)
    wb = Window.partitionBy("bucket")
    return (
        emb.select(
            F.col(id_col).alias("vec_id"),
            simhash_bucket(F.col(emb_col), signs).alias("bucket"),
            F.md5(
                F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))
            ).alias("pick_key"),
        )
        .withColumn("bucket_size", F.count(F.lit(1)).over(wb))
        .withColumn("__rk", F.row_number().over(w))
        .select(
            "vec_id",
            "bucket",
            "bucket_size",
            (F.col("__rk") <= per_bucket).cast("int").alias("pick"),
        )
    )


def _embedding_dim(emb: DataFrame, emb_col: str) -> int:
    row = emb.select(F.size(F.col(emb_col)).alias("d")).limit(1).collect()
    if not row:
        raise ValueError("empty embedding table — cannot infer dimensionality")
    return row[0]["d"]

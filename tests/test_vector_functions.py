"""Unit tests for the vector Column-expression kernels vs numpy references
(SURVEY.md §5.2 — the per-operator tests the reference repo lacks)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rabitq_spark.functions.vector import (
    asym_binary_dot,
    binary_dot,
    cosine_similarity,
    dot,
    l2_squared,
    pad_to_multiple,
    sign_binarize_packed,
    sign_binarize_pm1,
)

RNG = np.random.default_rng(7)


def _df_two_vecs(spark, a, b):
    return spark.createDataFrame(
        [(a.tolist(), b.tolist())], "a array<float>, b array<float>"
    )


def test_l2_squared_matches_numpy(spark):
    a = RNG.standard_normal(96).astype(np.float32)
    b = RNG.standard_normal(96).astype(np.float32)
    got = _df_two_vecs(spark, a, b).select(l2_squared("a", "b").alias("d")).first().d
    want = float(((a.astype(np.float64) - b.astype(np.float64)) ** 2).sum())
    assert got == pytest.approx(want, rel=1e-12)


def test_dot_and_cosine_match_numpy(spark):
    a = RNG.standard_normal(64).astype(np.float32)
    b = RNG.standard_normal(64).astype(np.float32)
    row = (
        _df_two_vecs(spark, a, b)
        .select(dot("a", "b").alias("dp"), cosine_similarity("a", "b").alias("cos"))
        .first()
    )
    ad, bd = a.astype(np.float64), b.astype(np.float64)
    assert row.dp == pytest.approx(float(ad @ bd), rel=1e-12)
    want_cos = float(ad @ bd / (np.linalg.norm(ad) * np.linalg.norm(bd)))
    assert row.cos == pytest.approx(want_cos, rel=1e-9)


def test_pad_to_multiple(spark):
    df = spark.createDataFrame([([1.0] * 100,)], "v array<float>")
    out = df.select(pad_to_multiple(F.col("v"), 64, 100).alias("p")).first().p
    assert len(out) == 128
    assert out[:100] == [1.0] * 100 and out[100:] == [0.0] * 28


def test_sign_binarize_packed_matches_reference_bit_order(spark):
    # bit i of word i//64 set iff v[i] > 0 (src/utils.rs:53-61)
    v = RNG.standard_normal(128).astype(np.float32)
    v[5] = 0.0  # zero is NOT positive
    df = spark.createDataFrame([(v.tolist(),)], "v array<float>")
    got = df.select(sign_binarize_packed(F.col("v"), 128).alias("c")).first().c
    want = np.zeros(2, dtype=np.uint64)
    for i, x in enumerate(v):
        if x > 0:
            want[i // 64] |= np.uint64(1) << np.uint64(i % 64)
    assert [np.int64(w) for w in want] == got


def test_sign_binarize_pm1(spark):
    df = spark.createDataFrame([([1.5, -0.2, 0.0],)], "v array<float>")
    out = df.select(sign_binarize_pm1(F.col("v")).alias("s")).first().s
    assert out == [1.0, -1.0, -1.0]


def test_binary_dot_matches_popcount(spark):
    a = RNG.integers(-(2**62), 2**62, 3).tolist()
    b = RNG.integers(-(2**62), 2**62, 3).tolist()
    df = spark.createDataFrame([(a, b)], "a array<bigint>, b array<bigint>")
    got = df.select(binary_dot("a", "b").alias("d")).first().d
    want = sum(bin((x & y) & ((1 << 64) - 1)).count("1") for x, y in zip(a, b))
    assert got == want


def test_asym_binary_dot_matches_scalar_reference(spark):
    # reference asymmetric_binary_dot_product (src/utils.rs:113-135)
    n_words, planes = 2, 4
    code = RNG.integers(0, 2**63, n_words).tolist()
    qplanes = RNG.integers(0, 2**63, n_words * planes).tolist()
    df = spark.createDataFrame(
        [(code, qplanes)], "code array<bigint>, qp array<bigint>"
    )
    got = df.select(asym_binary_dot(F.col("code"), F.col("qp"), planes).alias("d")).first().d
    want = 0
    for p in range(planes):
        plane = qplanes[p * n_words : (p + 1) * n_words]
        want += sum(bin(x & y).count("1") for x, y in zip(code, plane)) << p
    assert got == want

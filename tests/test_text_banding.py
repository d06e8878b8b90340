"""Banded LSH key regression: every band must use ITS OWN xor constant.

A `lambda x, c=c:` capture inside F.transform is parsed by PySpark as an
(element, index) lambda — the constant silently becomes the array index,
collapsing all bands to one key and costing recall (found when the
streaming near-dup twin flagged a pair the batch operator missed)."""

from pyspark.sql import functions as F


def test_bands_produce_distinct_keys_and_match_xor_minhash(spark):
    from rabitq_spark.functions.text import (
        banded_minhash_key,
        xor_minhash_key,
    )

    df = spark.createDataFrame(
        [([17, 293847, 99999999, 4], )], "hs array<bigint>"
    )
    row = df.select(
        *[banded_minhash_key("hs", b, 1).alias(f"b{b}") for b in range(8)],
        *[xor_minhash_key("hs", b).alias(f"x{b}") for b in range(8)],
    ).collect()[0]
    banded = [row[f"b{b}"] for b in range(8)]
    xored = [row[f"x{b}"] for b in range(8)]
    assert banded == xored  # r=1 must degrade exactly to xor_minhash_key
    assert len(set(banded)) == 8  # and the 8 bands must actually differ


def test_amplified_band_key_matches_scalar_reference(spark):
    from rabitq_spark.functions.text import (
        _MASK60,
        band_xor_constant,
        banded_minhash_key,
    )

    hs = [17, 293847, 99999999, 4]
    df = spark.createDataFrame([(hs,)], "hs array<bigint>")
    got = df.select(
        *[banded_minhash_key("hs", b, 4).alias(f"k{b}") for b in range(3)]
    ).collect()[0]
    for b in range(3):
        mins = [
            min(h ^ band_xor_constant(b * 4 + j) for h in hs) for j in range(4)
        ]
        want = 0
        for j, m in enumerate(mins):
            want ^= m << (4 - 1 - j)
        want &= _MASK60
        assert got[f"k{b}"] == want

"""Vector-math Column expressions — the engine's scalar-function layer.

These are the Spark-native re-expressions of the reference's SIMD kernels
(SURVEY.md §2.2/§2.3): pure `pyspark.sql.functions` Column trees, so they run
JVM-side inside whole-stage codegen — no Python in the hot path. The SIMD
dispatch of src/simd.rs is replaced by Catalyst codegen; the numerics are the
same formulas.

All distance math is done in DOUBLE regardless of input element type, with
left-to-right accumulation (F.aggregate walks the array in order), so results
are deterministic and reproducible against an external double-precision
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(arr: Column | str) -> Column:
    if isinstance(arr, str):
        arr = F.col(arr)
    return arr.cast("array<double>")


def l2_squared(a: Column, b: Column) -> Column:
    """Squared L2 distance between two float arrays.

    Re-expresses l2_squared_distance (reference src/utils.rs:139-152,
    src/simd.rs:14-73) as a codegen'd fold. Scores stay squared — the
    reference never sqrts (src/rerank.rs:85-94).
    """
    diff2 = F.zip_with(_to_double(a), _to_double(b), lambda x, y: (x - y) * (x - y))
    return F.aggregate(diff2, F.lit(0.0), lambda s, v: s + v)


def dot(a: Column, b: Column) -> Column:
    """Dot product (reference vector_dot_product, src/simd.rs:257-314)."""
    prod = F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda s, v: s + v)


def l2_norm(a: Column) -> Column:
    """Euclidean norm."""
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity with 0-norm guard (extension op; reference supports
    only L2 — README.md:19 cosine unchecked — but the 100 TB dedup pipeline
    needs it for embedding near-dup detection)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def pad_to_multiple(arr: Column, multiple: int, dim: int) -> Column:
    """Zero-pad an array so its length is the next multiple of `multiple`.

    Reference pads base/centroids/queries to dim % 64 == 0
    (src/rabitq.rs:167-179, :276-280) so packed codes are uniform u64 words.
    `dim` is the (static) unpadded dimension — schema is fixed per table,
    matching the reference's implicit fixed-dim schema (src/utils.rs:294).
    """
    pad = (multiple - dim % multiple) % multiple
    if pad == 0:
        return arr
    return F.concat(arr, F.array_repeat(F.lit(0.0).cast("float"), pad))


def sign_binarize_pm1(arr: Column) -> Column:
    """Elementwise sign → ±1.0 (reference vector_binarize_one,
    src/utils.rs:65-67: strictly positive → +1, else −1)."""
    return F.transform(arr, lambda x: F.when(x > 0, F.lit(1.0)).otherwise(F.lit(-1.0)))


def sign_binarize_packed(arr: Column, dim: int) -> Column:
    """Pack sign bits into BIGINT words, 64 per word, little-endian bit order.

    Reference vector_binarize_u64 (src/utils.rs:53-61): bit i of word i//64 is
    set iff v[i] > 0. Expressed as a nested fold over 64-element slices so it
    stays inside codegen. `dim` must already be padded to a multiple of 64.
    """
    n_words = dim // 64
    words = []
    for w in range(n_words):
        chunk = F.slice(arr, w * 64 + 1, 64)  # slice is 1-based
        # fold with index: shiftleft(1, i) OR'd in when element > 0
        indexed = F.zip_with(
            chunk,
            F.sequence(F.lit(0), F.lit(63)),
            # call_function: the SQL shiftleft takes a Column shift amount
            # (the Python wrapper artificially requires an int literal)
            lambda x, i: F.when(
                x > 0, F.call_function("shiftleft", F.lit(1).cast("bigint"), i)
            ).otherwise(F.lit(0).cast("bigint")),
        )
        words.append(F.aggregate(indexed, F.lit(0).cast("bigint"), lambda s, v: s.bitwiseOR(v)))
    return F.array(*words)


def binary_dot(a: Column, b: Column) -> Column:
    """Popcount of AND over packed BIGINT code words.

    Reference binary_dot_product (src/utils.rs:101-107; AVX2 Harley-Seal at
    src/simd.rs:326-384). Spark's built-in bit_count (3.3+) replaces the SIMD
    popcount — still whole-stage codegen.
    """
    anded = F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseAND(y)))
    return F.aggregate(anded, F.lit(0), lambda s, v: s + v)


def asym_binary_dot(code: Column, query_planes: Column, theta_log_dim: int = 4) -> Column:
    """Asymmetric binary dot: 1-bit codes x multi-bit-plane quantized query.

    Reference asymmetric_binary_dot_product (src/utils.rs:113-135): the query
    is stored as theta_log_dim consecutive bit-plane blocks, each the same
    word-length as the code; plane p contributes popcount(code & plane_p) << p.
    `query_planes` must have length = len(code) * theta_log_dim, plane-major.
    """
    n_words = F.size(code)
    total = F.lit(0).cast("bigint")
    for p in range(theta_log_dim):
        plane = F.slice(query_planes, (n_words * p) + 1, n_words)
        total = total + F.shiftleft(binary_dot(code, plane).cast("bigint"), p)
    return total

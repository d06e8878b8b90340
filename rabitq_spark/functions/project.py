"""Johnson–Lindenstrauss random projection — deterministic dimensionality
reduction for embedding columns (project 4096-dim vectors to a few hundred
dims BEFORE indexing/joining; JL guarantees pairwise distances survive to
within 1±ε w.h.p.).

The projection matrix is ±1/√k signs derived from md5 (same source-of-truth
pattern as the diversity sampler's hyperplanes): generated once in Python,
inlined into both the Spark plan and the oracle SQL, so the projected
vectors themselves are bit-exact across engines — each output coordinate is
a left-to-right IEEE fold.

Scale shape: pure per-row codegen (k × dim multiply-adds), no shuffle, no
UDF; composes with every downstream operator (kNN shortlist + exact rerank
on original vectors = tests/test_project.py's recall check).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def jl_signs(dim_out: int, dim_in: int, salt: str = "jl") -> list[list[float]]:
    """±1.0 sign matrix [dim_out][dim_in] from md5(salt|row|col)."""
    out = []
    for j in range(dim_out):
        row = []
        for i in range(dim_in):
            h = hashlib.md5(f"{salt}|{j}|{i}".encode()).hexdigest()
            row.append(1.0 if int(h[:8], 16) % 2 == 0 else -1.0)
        out.append(row)
    return out


def jl_coordinate(emb_col: Column | str, signs_row: list[float], scale: float) -> Column:
    """One projected coordinate: scale · Σ_i emb[i]·sign[i], left-to-right
    fold (bit-identical to the oracle's list_reduce)."""
    emb = F.col(emb_col) if isinstance(emb_col, str) else emb_col
    w = F.array(*[F.lit(v) for v in signs_row])
    dot = F.aggregate(
        F.zip_with(emb, w, lambda x, s: x.cast("double") * s),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return F.lit(scale) * dot


def jl_project(emb_col: Column | str, signs: list[list[float]]) -> Column:
    """array<double> of len(signs) projected coordinates, scale 1/√k."""
    k = len(signs)
    scale = 1.0 / (k ** 0.5)
    return F.array(*[jl_coordinate(emb_col, row, scale) for row in signs])

"""Maximal Marginal Relevance (MMR) result diversification (Carbonell &
Goldstein, SIGIR'98) — the retrieval/RAG staple that trades relevance
against redundancy when picking the final k results:

    next = argmax_d  λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)

The greedy loop is inherently sequential PER QUERY but embarrassingly
parallel ACROSS queries, so it runs as applyInPandas over query groups —
the documented custom-operator path for semantics DataFrame ops can't
express (brief: composition → Pandas-UDF → mapPartitions). Candidate sets
are shortlists (tens of rows), so per-group state is tiny and the shuffle
is one partitioning by query_id.

Bit-exactness contract: every float op mirrors the DuckDB recursive-CTE
oracle exactly — similarities are LEFT-TO-RIGHT scalar loops over
double-widened coordinates (matching list_reduce folds; numpy's SIMD/
pairwise dot would NOT match), and the caller passes λ and (1−λ) as the
same doubles the oracle SQL inlines (1.0−0.7 is 0.30000000000000004 — the
oracle must say so too, see queries.py::_sql_mmr)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "cand_id",
    rel_col: str = "rel",
    vec_col: str = "vec",
) -> DataFrame:
    """(query_id, cand_id, rank) — the greedy MMR pick from each query's
    candidate shortlist. First pick = highest relevance; subsequent picks
    maximize λ·rel − (1−λ)·max-dot-to-selected; ties break on ascending
    candidate id (identical to the oracle's ORDER BY ... DESC, cand_id)."""
    one_minus = 1.0 - lam

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].tolist()
        rels = [float(r) for r in pdf[rel_col]]
        vecs = [[float(x) for x in v] for v in pdf[vec_col]]
        n = len(ids)
        if n == 0:
            return pd.DataFrame({query_col: [], id_col: [], "rank": []})
        remaining = set(range(n))

        def dot_lr(a: list[float], b: list[float]) -> float:
            s = 0.0
            for x, y in zip(a, b):
                s += x * y
            return s

        # step 1: argmax rel, tie by ascending id
        first = min(remaining, key=lambda i: (-rels[i], ids[i]))
        picked = [first]
        remaining.discard(first)
        maxsim = {i: None for i in remaining}
        while remaining and len(picked) < k:
            last = picked[-1]
            best = None
            for i in remaining:
                s = dot_lr(vecs[i], vecs[last])
                prev = maxsim[i]
                # list_max over the selected set, built incrementally;
                # max() comparisons are exact on identical doubles
                maxsim[i] = s if prev is None or s > prev else prev
                score = lam * rels[i] - one_minus * maxsim[i]
                cand = (-score, ids[i], i)
                if best is None or cand < best:
                    best = cand
            picked.append(best[2])
            remaining.discard(best[2])
        qv = pdf[query_col].iloc[0]
        return pd.DataFrame(
            {
                query_col: [qv] * len(picked),
                id_col: [ids[i] for i in picked],
                "rank": list(range(1, len(picked) + 1)),
            }
        )

    q_type = candidates.schema[query_col].dataType.simpleString()
    i_type = candidates.schema[id_col].dataType.simpleString()
    return candidates.groupBy(query_col).applyInPandas(
        pick, f"{query_col} {q_type}, {id_col} {i_type}, rank int"
    )

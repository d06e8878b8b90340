"""Similarity join: table × table top-k nearest neighbors under squared L2 —
the reference's J1/J2/J3 pipeline generalized from a query batch to a full
table (SURVEY.md §2.5, §7 phase 6).

The left table becomes the query side of the IVF+RaBitQ batch search; the
right table is indexed once. Both sides scale horizontally: the index is
partitioned by cluster_id, the probe table shuffles by cluster_id, and the
only per-pair work that survives past the quantized screen is the exact
rerank of the top-R shortlist. No all-pairs materialization at any point —
candidate volume per left row is bounded by the probed posting lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from rabitq_spark.config import RaBitQConfig
from rabitq_spark.index import RaBitQModel, build_index, search


def similarity_join(
    left: DataFrame,
    right: DataFrame | RaBitQModel,
    k: int,
    left_id: str = "id",
    left_vec: str = "vec",
    right_id: str = "id",
    right_vec: str = "vec",
    config: RaBitQConfig | None = None,
    nprobe: int | None = None,
    overfetch: int | None = None,
    exhaustive: bool = False,
) -> DataFrame:
    """Top-k right neighbors for every left row.

    Returns (query_id = left id, neighbor_id = right id, dist, rank).
    `exhaustive=True` probes every cluster and reranks every candidate —
    exact results (the oracle configuration); otherwise nprobe/overfetch
    trade recall for work exactly like batch search.
    """
    if isinstance(right, RaBitQModel):
        model = right
    else:
        model = build_index(
            right, config or RaBitQConfig(), id_col=right_id, vec_col=right_vec
        )
    queries = left.select(left_id, left_vec).withColumnsRenamed(
        {left_id: "query_id", left_vec: "qvec"}
    )
    if exhaustive:
        # Exhaustive == exact brute force; the BLAS-shortlist + fold-refine
        # plan gives identical (bit-exact) results without pushing every
        # candidate through the quantized scoring path — at full-table query
        # load the N² rough-scoring stage would dominate for no benefit.
        from pyspark.sql import functions as F

        from rabitq_spark.functions.vector import pad_to_multiple
        from rabitq_spark.operators.knn import knn_exact_refined

        padded_q = queries.select(
            "query_id", pad_to_multiple(F.col("qvec"), 64, model.dim).alias("qvec")
        )
        return knn_exact_refined(
            padded_q, model.base_df, k,
            query_id="query_id", query_vec="qvec",
            base_id="orig_id", base_vec="vec",
        )
    return search(model, queries, topk=k, nprobe=nprobe, overfetch=overfetch)

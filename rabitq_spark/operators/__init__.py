from rabitq_spark.operators.ann import ann_search
from rabitq_spark.operators.asof import asof_join_backward
from rabitq_spark.operators.chunking import chunk_documents, hash_split
from rabitq_spark.operators.dedup import (
    dedup_exact,
    embedding_neardup_pairs,
    neardup_minhash_pairs,
    simhash_pairs,
)
from rabitq_spark.operators.events import (
    funnel_counts,
    sessionize,
    tumbling_window_agg,
)
from rabitq_spark.operators.interval import interval_join, interval_join_stream
from rabitq_spark.operators.knn import knn_exact, knn_exact_fast, knn_exact_refined
from rabitq_spark.operators.simjoin import similarity_join
from rabitq_spark.operators.skew import salted_join
from rabitq_spark.operators.topk import topk_per_group

__all__ = [
    "ann_search",
    "asof_join_backward",
    "chunk_documents",
    "dedup_exact",
    "embedding_neardup_pairs",
    "funnel_counts",
    "hash_split",
    "interval_join",
    "interval_join_stream",
    "knn_exact",
    "knn_exact_fast",
    "knn_exact_refined",
    "neardup_minhash_pairs",
    "salted_join",
    "sessionize",
    "simhash_pairs",
    "similarity_join",
    "topk_per_group",
    "tumbling_window_agg",
]

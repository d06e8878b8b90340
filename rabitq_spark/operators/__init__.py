from rabitq_spark.operators.knn import knn_exact, knn_exact_fast
from rabitq_spark.operators.topk import topk_per_group

__all__ = ["knn_exact", "knn_exact_fast", "topk_per_group"]

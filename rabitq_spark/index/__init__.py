from rabitq_spark.index.build import (
    append_to_index,
    build_index,
    compact_index,
    delete_from_index,
    upsert_into_index,
)
from rabitq_spark.index.model import RaBitQModel
from rabitq_spark.index.search import range_search, search
from rabitq_spark.index.vecstore import VecStore, attach_vec_store, build_vec_store

# imported LAST: adaptive pulls in rabitq_spark.operators, whose ann/simjoin
# modules import RaBitQModel/search back from THIS package — the names above
# must already be bound
from rabitq_spark.index.adaptive import search_adaptive  # noqa: E402

__all__ = [
    "RaBitQModel",
    "VecStore",
    "append_to_index",
    "attach_vec_store",
    "build_index",
    "build_vec_store",
    "compact_index",
    "delete_from_index",
    "range_search",
    "search",
    "search_adaptive",
    "upsert_into_index",
]

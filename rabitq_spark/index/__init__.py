from rabitq_spark.index.build import (
    append_to_index,
    build_index,
    compact_index,
    delete_from_index,
    upsert_into_index,
)
from rabitq_spark.index.model import RaBitQModel
from rabitq_spark.index.search import range_search, search

__all__ = [
    "RaBitQModel",
    "append_to_index",
    "build_index",
    "compact_index",
    "delete_from_index",
    "range_search",
    "search",
    "upsert_into_index",
]

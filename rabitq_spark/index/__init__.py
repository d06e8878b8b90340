from rabitq_spark.index.build import append_to_index, build_index
from rabitq_spark.index.model import RaBitQModel
from rabitq_spark.index.search import search

__all__ = ["RaBitQModel", "append_to_index", "build_index", "search"]

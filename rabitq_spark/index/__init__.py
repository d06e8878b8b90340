from rabitq_spark.index.build import build_index
from rabitq_spark.index.model import RaBitQModel
from rabitq_spark.index.search import search

__all__ = ["RaBitQModel", "build_index", "search"]

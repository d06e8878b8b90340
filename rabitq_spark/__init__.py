"""rabitq_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kemingy/rabitq (IVF + RaBitQ binary-quantized
ANN search), extended with large-scale training-data pipeline operators
(dedup, similarity join, text analysis, multimodal plumbing).

Everything is DataFrame/SQL-first: logical plans are declared with the
PySpark DataFrame API and optimized by Catalyst; Python only runs inside
Arrow-batched pandas UDFs on the BLAS-heavy kernels (rotation, bulk
distance), never row-at-a-time.

Reference behavior surveyed in SURVEY.md (file:line citations therein).
"""

from rabitq_spark.config import RaBitQConfig
from rabitq_spark.session import get_spark

__all__ = ["RaBitQConfig", "get_spark"]
__version__ = "0.1.0"

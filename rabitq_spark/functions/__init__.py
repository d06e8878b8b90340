from rabitq_spark.functions.vector import (
    asym_binary_dot,
    binary_dot,
    cosine_similarity,
    dot,
    l2_squared,
    pad_to_multiple,
    sign_binarize_packed,
    sign_binarize_pm1,
)

__all__ = [
    "asym_binary_dot",
    "binary_dot",
    "cosine_similarity",
    "dot",
    "l2_squared",
    "pad_to_multiple",
    "sign_binarize_packed",
    "sign_binarize_pm1",
]

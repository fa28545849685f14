from chroma_rs_spark.functions.vector import (
    cosine_distance,
    dot_product,
    ip_distance,
    l2_distance,
    l2_norm,
    vector_lit,
)

__all__ = [
    "dot_product",
    "l2_norm",
    "cosine_distance",
    "l2_distance",
    "ip_distance",
    "vector_lit",
]

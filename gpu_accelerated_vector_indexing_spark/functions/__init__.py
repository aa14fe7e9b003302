from gpu_accelerated_vector_indexing_spark.functions.vector import (
    cosine_similarity,
    cosine_similarity_pandas,
    dot_product,
    l2_norm,
    l2_normalize,
)

__all__ = [
    "cosine_similarity",
    "cosine_similarity_pandas",
    "dot_product",
    "l2_norm",
    "l2_normalize",
]

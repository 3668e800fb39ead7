from shmr_spark.similarity.index import build_ivf_index, search_ivf_index
from shmr_spark.similarity.search import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    ivf_assign,
    kmeans_centroids,
    cosine_topk_ivf,
    cosine_topk_quantized_rerank,
)

__all__ = [
    "build_ivf_index",
    "search_ivf_index",
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
    "ivf_assign",
    "kmeans_centroids",
    "cosine_topk_ivf",
    "cosine_topk_quantized_rerank",
]

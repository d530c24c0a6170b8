"""faiss_spark — a PySpark-native batch vector analytics engine.

Re-expresses the query/data-processing capabilities of faiss (reference:
myscale fork, v1.7.3) as idiomatic Spark DataFrame programs: brute-force
and IVF k-NN / range search, k-means clustering, vector transforms,
quantizer codecs, plus LLM-training-data pipeline operators
(deduplication, similarity join, text analysis) designed for 100 TB scale.

Design (see SURVEY.md):
- An "index" is a partitioned Parquet table + a small broadcastable model
  artifact (centroids / codebooks / transform matrices) — never a server
  object.
- Distances are declared with built-in SQL expressions where exactness vs
  a SQL oracle matters, and computed with numpy GEMM inside Arrow-batched
  ``mapInPandas`` on the hot path (mirrors faiss's BLAS brute-force path,
  reference faiss/utils/distances.cpp:271-354).
- Top-k is per-partition bounded selection + a small global merge
  (reference faiss/python/extra_wrappers.py:136-174 ResultHeap semantics).
"""

from faiss_spark.operators.knn import knn, knn_join, range_search
from faiss_spark.operators.cluster import KMeans
from faiss_spark.operators.ivf import IVFIndex

__version__ = "0.1.0"

__all__ = [
    "knn",
    "knn_join",
    "range_search",
    "KMeans",
    "IVFIndex",
    "__version__",
]

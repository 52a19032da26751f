"""spark_nnd_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference NN-Descent library
(fvictorio/spark-nnd), rebuilt Spark-first.

Layers:

- ``spark_nnd_spark.nnd`` — approximate K-NN graph construction
  (``build_graph``, NN-Descent per Dong et al. WWW'11 / Warashina's
  MapReduce adaptation) plus an exact oracle (``build_graph_exact``).
  Reference surface: NND.scala:66 ``buildGraph``.
- ``spark_nnd_spark.operators`` — the relational/dataflow primitives the
  algorithm is composed of (per-group top-K, dedup-with-preference,
  sampling, joins), exposed as first-class DataFrame operators, plus
  training-data-pipeline operators (dedup family, ANN search, text
  analysis, multimodal plumbing).
- ``spark_nnd_spark.functions`` — column-expression builders (vector
  similarity, text metrics) that stay JVM-side.
- ``spark_nnd_spark.sources`` — table loaders for the test corpus.
- ``spark_nnd_spark.streaming`` — Structured Streaming extensions over the
  ``events`` table (beyond reference parity; the reference has no
  streaming surface — SURVEY.md §2.3).

Everything is DataFrame-native: logical plans are declared with the
DataFrame/SQL API and Catalyst/Tungsten/AQE pick the physical strategy.
Python executes only inside Arrow-batched pandas UDFs where numpy
genuinely wins (the NN-Descent local join).
"""

from spark_nnd_spark.session import get_spark
from spark_nnd_spark.schemas import POINT_SCHEMA, GRAPH_SCHEMA, NEIGHBOR_STRUCT
from spark_nnd_spark.functions.vector import (
    similarity_expr,
    subtract_expr,
    l2_distance_expr,
    cosine_similarity_expr,
    dot_expr,
)
from spark_nnd_spark.nnd.exact import build_graph_exact
from spark_nnd_spark.nnd.descent import build_graph, update_graph, update_graph_delta
from spark_nnd_spark.nnd.search import graph_search_topk

__all__ = [
    "get_spark",
    "POINT_SCHEMA",
    "GRAPH_SCHEMA",
    "NEIGHBOR_STRUCT",
    "similarity_expr",
    "subtract_expr",
    "l2_distance_expr",
    "cosine_similarity_expr",
    "dot_expr",
    "build_graph_exact",
    "build_graph",
    "update_graph",
    "update_graph_delta",
    "graph_search_topk",
]

__version__ = "0.1.0"

from spark_nnd_spark.nnd.exact import build_graph_exact
from spark_nnd_spark.nnd.descent import build_graph, update_graph, update_graph_delta
from spark_nnd_spark.nnd.search import brute_topk_l2, graph_search_topk

__all__ = [
    "build_graph_exact",
    "build_graph",
    "update_graph",
    "update_graph_delta",
    "graph_search_topk",
    "brute_topk_l2",
]

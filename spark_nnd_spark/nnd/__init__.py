from spark_nnd_spark.nnd.exact import build_graph_exact
from spark_nnd_spark.nnd.descent import build_graph, update_graph

__all__ = ["build_graph_exact", "build_graph", "update_graph"]

"""parallel_pagerank_spark — a from-scratch PySpark-native link-graph
analytics engine with the capabilities of the MPI Parallel-PageRank reference
(see SURVEY.md): transcript→edge derivation, power-iteration PageRank with
dangling-mass redistribution, connected components by min-label propagation,
label propagation clustering, triangle counting, graph statistics, plus
training-data-pipeline operators (dedup, similarity search, text analysis).
"""

from .config import EngineConfig, PageRankConfig
from .session import get_spark

__all__ = ["EngineConfig", "PageRankConfig", "get_spark"]
__version__ = "0.2.0"

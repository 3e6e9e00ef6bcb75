from bigdata_hits_spark.operators.graph import Graph, topic_induced, neighborhood
from bigdata_hits_spark.operators.ranking import (
    RankResult,
    hits,
    salsa,
    salsa_simplified,
    list_topics,
)

__all__ = [
    "Graph",
    "topic_induced",
    "neighborhood",
    "RankResult",
    "hits",
    "salsa",
    "salsa_simplified",
    "list_topics",
]

from spotify_recommender_tpu.retrieval.index import CatalogIndex
from spotify_recommender_tpu.retrieval.retriever import Retriever, Recommendation
from spotify_recommender_tpu.retrieval.streaming_retriever import (
    StreamingRetriever,
)

__all__ = [
    "CatalogIndex", "Retriever", "Recommendation", "StreamingRetriever",
]

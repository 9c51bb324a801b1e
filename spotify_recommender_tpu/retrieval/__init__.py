from spotify_recommender_tpu.retrieval.index import CatalogIndex
from spotify_recommender_tpu.retrieval.retriever import Retriever, Recommendation

__all__ = ["CatalogIndex", "Retriever", "Recommendation"]

from spotify_recommender_tpu.serve.server import serve, RecommenderService

__all__ = ["serve", "RecommenderService"]

from spotify_recommender_tpu.ops.similarity import (
    cosine_scores,
    cosine_scores_batched,
    exact_topk,
    topk_scores,
)
from spotify_recommender_tpu.ops.topk import merge_topk

__all__ = [
    "cosine_scores",
    "cosine_scores_batched",
    "exact_topk",
    "topk_scores",
    "merge_topk",
]

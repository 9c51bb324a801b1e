from spotify_recommender_tpu.parallel.sharding import (
    ShardedCatalog,
    sharded_topk_retrieve,
)

__all__ = ["ShardedCatalog", "sharded_topk_retrieve"]

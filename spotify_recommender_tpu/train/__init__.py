from spotify_recommender_tpu.train.checkpoint import (
    CheckpointManager,
    save_checkpoint,
    restore_checkpoint,
)

__all__ = ["CheckpointManager", "save_checkpoint", "restore_checkpoint"]

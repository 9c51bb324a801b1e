from spotify_recommender_tpu.core.config import (
    CatalogConfig,
    MeshConfig,
    RetrievalConfig,
    MFConfig,
    TwoTowerConfig,
)
from spotify_recommender_tpu.core.mesh import make_mesh, device_info
from spotify_recommender_tpu.core.logging import get_logger

__all__ = [
    "CatalogConfig",
    "MeshConfig",
    "RetrievalConfig",
    "MFConfig",
    "TwoTowerConfig",
    "make_mesh",
    "device_info",
    "get_logger",
]

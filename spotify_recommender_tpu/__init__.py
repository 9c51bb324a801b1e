"""spotify_recommender_tpu — a TPU-native candidate-retrieval and recommender
framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CUDA/C++ recommender (``Iamdarika/Spotify_recommender``): CSV → normalized
catalog preprocessing, exact cosine top-k retrieval, plus the extended scope of
the north-star baseline — batched retrieval fused on-device, sharded catalogs
over device meshes, ALS/SGD matrix factorization, and two-tower training.

Layer map (see SURVEY.md §7):

- ``core``      — config dataclasses, mesh/device setup, logging, rng
- ``data``      — feature schema, CSV ingest, jit normalization, catalog artifact
- ``ops``       — jnp oracle scorer + Pallas fused score/top-k kernels
- ``retrieval`` — Catalog + Retriever API (by row / id / name, batched)
- ``models``    — ALS & SGD matrix factorization, two-tower
- ``parallel``  — mesh specs, sharded catalog, partial top-k + allgather merge
- ``train``     — train loops, checkpointing
- ``cli``       — `preprocess`, `recommend`, `train`, `serve`, `benchmark`
"""

from spotify_recommender_tpu.version import __version__

__all__ = ["__version__"]

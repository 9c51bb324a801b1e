"""Sharded-catalog retrieval: row-shard the item matrix over the mesh.

The reference is strictly single-device (`cudaSetDevice(0)`, reference
Recommender.cu:124) with no communication backend (SURVEY.md §2).  The
TPU-native scale-out plan (SURVEY.md §7 step 3):

- the catalog's N axis is sharded over mesh axis "catalog" (this workload's
  natural tensor parallelism) with `NamedSharding`;
- each device scores its rows and selects a **local** top-k with local→global
  index translation — only (k scores + k indices) per query per shard ride
  the ICI, never the (B, N) score matrix;
- an `all_gather` over "catalog" collects the per-shard candidates and a
  final deterministic merge selects the global top-k, tie-breaking by global
  index so results are invariant to the shard layout;
- queries are replicated over "catalog" and (optionally) sharded over
  "data" for query-batch data parallelism.

Padding rows (to equalize shard sizes) carry -inf scores so they can never
enter a top-k.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spotify_recommender_tpu.core.config import COSINE_EPS
from spotify_recommender_tpu.core.logging import get_logger
from spotify_recommender_tpu.ops import similarity
from spotify_recommender_tpu.ops.topk import merge_topk_deterministic

log = get_logger(__name__)


def _pad_to_multiple(x: np.ndarray, multiple: int) -> np.ndarray:
    n = x.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return x
    pad_block = np.zeros((pad,) + x.shape[1:], dtype=x.dtype)
    return np.concatenate([x, pad_block], axis=0)


def _local_score_topk(
    queries: jnp.ndarray,       # (B, F) replicated
    features: jnp.ndarray,      # (N_local, F) this shard's rows
    norms: jnp.ndarray,         # (N_local,)
    exclude_rows: jnp.ndarray,  # (B,) global row ids, -1 = none
    valid_rows: jnp.ndarray,    # () int32: global N (pad rows >= this)
    k: int,
    eps: float,
    axis_name: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-shard body run under shard_map."""
    shard = jax.lax.axis_index(axis_name)
    n_local = features.shape[0]
    offset = shard * n_local

    scores = similarity.cosine_scores_batched(queries, features, norms, eps)
    global_cols = offset + jnp.arange(n_local, dtype=jnp.int32)
    # mask padding rows and the per-query excluded row
    pad_mask = global_cols[None, :] >= valid_rows
    excl_mask = global_cols[None, :] == exclude_rows.astype(jnp.int32)[:, None]
    scores = jnp.where(pad_mask | excl_mask, similarity.NEG_INF, scores)

    k_local = min(k, n_local)
    local_scores, local_idx = jax.lax.top_k(scores, k_local)
    cand_scores = jax.lax.all_gather(
        local_scores, axis_name, axis=1, tiled=True
    )  # (B, n_shards * k_local)
    cand_idx = jax.lax.all_gather(
        offset + local_idx.astype(jnp.int32), axis_name, axis=1, tiled=True
    )
    return merge_topk_deterministic(cand_scores, cand_idx, k)


@partial(jax.jit, static_argnames=("k", "eps", "mesh", "axis_name"))
def sharded_topk_retrieve(
    queries: jnp.ndarray,
    features: jnp.ndarray,
    norms: jnp.ndarray,
    exclude_rows: jnp.ndarray,
    valid_rows: jnp.ndarray,
    *,
    k: int,
    mesh: Mesh,
    axis_name: str = "catalog",
    eps: float = COSINE_EPS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-sharded exact top-k over the mesh (see module docstring)."""
    body = partial(
        _local_score_topk, k=k, eps=eps, axis_name=axis_name
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(),                 # queries replicated
            P(axis_name, None),  # features row-sharded
            P(axis_name),        # norms row-sharded
            P(),                 # exclude replicated
            P(),                 # valid_rows replicated
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, features, norms, exclude_rows, valid_rows)


class ShardedCatalog:
    """Device-resident, row-sharded catalog features + norms."""

    def __init__(
        self,
        features: np.ndarray,
        norms: np.ndarray,
        mesh: Mesh,
        axis_name: str = "catalog",
        eps: float = COSINE_EPS,
    ) -> None:
        self.mesh = mesh
        self.axis_name = axis_name
        self.eps = eps
        self.num_items = features.shape[0]
        n_shards = mesh.shape[axis_name]
        feats = _pad_to_multiple(np.asarray(features, np.float32), n_shards)
        nrm = _pad_to_multiple(np.asarray(norms, np.float32), n_shards)
        row_sharding = NamedSharding(mesh, P(axis_name, None))
        self.features = jax.device_put(feats, row_sharding)
        self.norms = jax.device_put(nrm, NamedSharding(mesh, P(axis_name)))
        self._valid = jnp.asarray(self.num_items, jnp.int32)
        log.info(
            "sharded catalog: %d items (+%d pad) over %d '%s' shards",
            self.num_items,
            feats.shape[0] - self.num_items,
            n_shards,
            axis_name,
        )

    def retrieve(
        self,
        queries: jnp.ndarray,
        k: int,
        exclude_rows: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = queries.shape[0]
        if exclude_rows is None:
            exclude_rows = jnp.full((b,), -1, jnp.int32)
        return sharded_topk_retrieve(
            queries,
            self.features,
            self.norms,
            exclude_rows,
            self._valid,
            k=k,
            mesh=self.mesh,
            axis_name=self.axis_name,
            eps=self.eps,
        )

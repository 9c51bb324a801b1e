"""Two-tower retrieval model with in-batch softmax negatives.

BASELINE config 5 scope (the reference has no learned models at all).
TPU-first shape:

- Flax towers (query + item) mapping feature vectors → L2-normalized
  embeddings; all dense layers are MXU matmuls, batch-major.
- InfoNCE with **in-batch negatives**: one (B, D)x(D, B) logits GEMM per
  step instead of per-negative scoring.
- Data parallelism under `shard_map`: the batch is sharded over the mesh's
  "data" axis; each shard computes local query embeddings, `all_gather`s
  item embeddings over ICI so every local query sees the **global** batch
  as negatives, and gradients are `psum`'d — the canonical TPU two-tower
  recipe.
- Serving: embed the catalog once, then reuse the exact same retrieval
  stack (ops/similarity.py oracle or the fused Pallas kernel) — learned
  and hand-crafted embeddings share one serving path by construction.

Training pairs: by default self-supervised same-genre positives from the
catalog (the dataset ships no co-listen data); any (query_feats,
item_feats) pair stream plugs in.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from spotify_recommender_tpu.core.config import TwoTowerConfig
from spotify_recommender_tpu.core.logging import get_logger

log = get_logger(__name__)


class Tower(nn.Module):
    """MLP tower → embedding (L2-normalized by default).

    `dtype` is the COMPUTE dtype (bf16 = single-pass MXU matmuls);
    params always live in fp32 (flax param_dtype default) and the
    normalize epilogue upcasts, so training stays numerically stable —
    the canonical TPU mixed-precision recipe.

    `normalize=False` keeps the raw MLP output: embedding MAGNITUDE can
    then encode item popularity, which cosine towers provably cannot
    (docs/PERFORMANCE.md round-5 ceiling analysis: on the co-listen
    benchmark workload the cosine item-item ceiling is ~0.17 recall@10
    while raw-dot reaches ~0.25)."""

    hidden_dims: Tuple[int, ...]
    embedding_dim: int
    dtype: jnp.dtype = jnp.float32
    normalize: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for h in self.hidden_dims:
            x = nn.relu(nn.Dense(h, dtype=self.dtype)(x))
        x = nn.Dense(self.embedding_dim, dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        if not self.normalize:
            return x
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, 1e-8)


class TwoTower(nn.Module):
    config: TwoTowerConfig

    def setup(self) -> None:
        dims = tuple(self.config.hidden_dims)
        dtype = (
            jnp.bfloat16
            if getattr(self.config, "compute_dtype", "float32") == "bfloat16"
            else jnp.float32
        )
        self.query_tower = Tower(dims, self.config.embedding_dim, dtype)
        # item embeddings optionally carry magnitude (popularity); the
        # query side stays unit-norm so logits remain scale-bounded
        self.item_tower = Tower(
            dims, self.config.embedding_dim, dtype,
            normalize=getattr(self.config, "normalize_items", True),
        )

    def __call__(self, q: jnp.ndarray, i: jnp.ndarray):
        return self.query_tower(q), self.item_tower(i)

    def embed_query(self, q: jnp.ndarray) -> jnp.ndarray:
        return self.query_tower(q)

    def embed_item(self, i: jnp.ndarray) -> jnp.ndarray:
        return self.item_tower(i)


def info_nce_loss(
    q_emb: jnp.ndarray,       # (b, D) local queries
    i_emb: jnp.ndarray,       # (b, D) local items (positives, row-aligned)
    temperature: float,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Symmetric in-batch softmax loss; with `axis_name`, negatives span
    the global batch via all_gather over the data axis."""
    if axis_name is not None:
        i_all = jax.lax.all_gather(i_emb, axis_name, axis=0, tiled=True)
        b = q_emb.shape[0]
        labels = jax.lax.axis_index(axis_name) * b + jnp.arange(b)
    else:
        i_all = i_emb
        labels = jnp.arange(q_emb.shape[0])
    logits = jnp.dot(
        q_emb, i_all.T, preferred_element_type=jnp.float32
    ) / jnp.float32(temperature)
    loss_q = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return jnp.mean(loss_q)


def make_train_step(
    model: TwoTower,
    optimizer: optax.GradientTransformation,
    temperature: float,
    axis_name: Optional[str] = None,
) -> Callable:
    def train_step(params, opt_state, q_batch, i_batch):
        def loss_fn(p):
            q_emb = model.apply(p, q_batch, method=TwoTower.embed_query)
            i_emb = model.apply(p, i_batch, method=TwoTower.embed_item)
            return info_nce_loss(q_emb, i_emb, temperature, axis_name)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


@dataclasses.dataclass
class TrainResult:
    params: Dict
    losses: list


def same_genre_pairs(
    features: np.ndarray,
    genre_ids: np.ndarray,
    batch_size: int,
    rng: np.random.Generator,
    noise: float = 0.05,
) -> Tuple[np.ndarray, np.ndarray]:
    """Self-supervised positives: (song, other song of the same genre),
    with small feature noise on the query side as augmentation."""
    n = features.shape[0]
    anchors = rng.integers(0, n, size=batch_size)
    positives = np.empty(batch_size, np.int64)
    by_genre: Dict[int, np.ndarray] = {}
    for b, a in enumerate(anchors):
        g = int(genre_ids[a])
        pool = by_genre.get(g)
        if pool is None:
            pool = np.flatnonzero(genre_ids == g)
            by_genre[g] = pool
        positives[b] = pool[rng.integers(0, len(pool))]
    q = features[anchors] + noise * rng.standard_normal(
        (batch_size, features.shape[1])
    ).astype(np.float32)
    return q.astype(np.float32), features[positives].astype(np.float32)


def colisten_pair_fn(
    interactions,
    features: np.ndarray,
    rng: np.random.Generator,
    noise: float = 0.0,
):
    """Pair source from implicit feedback: positives are two items played
    by the same user (co-listen), the standard collaborative signal for
    two-tower training. Returns a pair_fn(batch_size) for `train`.

    `interactions` is a models.mf.Interactions; users with fewer than two
    interactions are excluded.  Fully vectorized (no per-user or per-batch
    Python loops — at north-star user counts those dominated)."""
    degrees = interactions.mask.sum(axis=1)
    eligible = np.nonzero(degrees >= 2)[0]
    if len(eligible) == 0:
        raise ValueError("no users with >= 2 interactions")
    item_idx = interactions.item_idx

    def pair_fn(batch_size: int):
        u = eligible[rng.integers(0, len(eligible), batch_size)]
        d = degrees[u]
        # two distinct valid positions per sampled user, vectorized:
        # a uniform in [0, d), p uniform in [0, d-1) shifted past a
        a = rng.integers(0, d)
        p = rng.integers(0, d - 1)
        p = np.where(p >= a, p + 1, p)
        q_rows = item_idx[u, a]
        p_rows = item_idx[u, p]
        q = features[q_rows].astype(np.float32)
        if noise:
            q = q + noise * rng.standard_normal(q.shape).astype(np.float32)
        return q, features[p_rows].astype(np.float32)

    return pair_fn


def train(
    features: np.ndarray,
    genre_ids: np.ndarray,
    config: TwoTowerConfig,
    mesh: Optional[Mesh] = None,
    pair_fn=None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 100,
) -> TrainResult:
    """Train the two towers; with a mesh, batches shard over "data".

    With `checkpoint_dir`, params + optimizer state checkpoint every
    `checkpoint_every` steps (Orbax) and training RESUMES from the latest
    checkpoint if one exists."""
    model = TwoTower(config)
    rng = np.random.default_rng(config.seed)
    feat_dim = features.shape[1]
    params = model.init(
        jax.random.PRNGKey(config.seed),
        jnp.zeros((1, feat_dim)),
        jnp.zeros((1, feat_dim)),
    )
    optimizer = optax.adam(config.learning_rate)
    opt_state = optimizer.init(params)

    ckpt_mgr = None
    start_step = 0
    if checkpoint_dir is not None:
        from spotify_recommender_tpu.train.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(checkpoint_dir)
        latest = ckpt_mgr.latest_step()
        if latest is not None:
            state = ckpt_mgr.restore(
                latest, template={"params": params, "opt_state": opt_state}
            )
            params, opt_state = state["params"], state["opt_state"]
            start_step = latest + 1
            log.info("resumed two-tower training from step %d", start_step)
    pair_fn = pair_fn or (
        lambda b: same_genre_pairs(features, genre_ids, b, rng)
    )

    if mesh is not None and mesh.shape.get("data", 1) > 1:
        step = jax.jit(
            jax.shard_map(
                make_train_step(
                    model, optimizer, config.temperature, axis_name="data"
                ),
                mesh=mesh,
                in_specs=(P(), P(), P("data", None), P("data", None)),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
        )
    else:
        step = jax.jit(
            make_train_step(model, optimizer, config.temperature, None)
        )

    losses = []
    for s in range(start_step, config.num_steps):
        q, i = pair_fn(config.batch_size)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(q), jnp.asarray(i)
        )
        if s % 50 == 0 or s == config.num_steps - 1:
            losses.append(float(loss))
        if ckpt_mgr is not None and (
            (s + 1) % checkpoint_every == 0 or s == config.num_steps - 1
        ):
            ckpt_mgr.save(
                s, {"params": params, "opt_state": opt_state}, force=True
            )
    if ckpt_mgr is not None:
        ckpt_mgr.wait()
        ckpt_mgr.close()
    if not losses:  # fully resumed past num_steps
        losses = [float("nan")]
    log.info("two-tower done: loss %.4f -> %.4f", losses[0], losses[-1])
    return TrainResult(params=params, losses=losses)


def embed_catalog(
    params: Dict, features: np.ndarray, config: TwoTowerConfig,
    batch: int = 8192,
) -> np.ndarray:
    """Item-tower embeddings for the whole catalog (serving-side corpus)."""
    model = TwoTower(config)
    apply = jax.jit(partial(model.apply, method=TwoTower.embed_item))
    out = []
    for s in range(0, features.shape[0], batch):
        out.append(np.asarray(apply(params, jnp.asarray(features[s : s + batch]))))
    return np.concatenate(out, axis=0)


def embed_queries(
    params: Dict, features: np.ndarray, config: TwoTowerConfig
) -> np.ndarray:
    model = TwoTower(config)
    apply = jax.jit(partial(model.apply, method=TwoTower.embed_query))
    return np.asarray(apply(params, jnp.asarray(features)))


def embed_user_profile(
    params: Dict,
    liked_item_features: np.ndarray,   # (n_liked, F)
    config: TwoTowerConfig,
    weights: Optional[np.ndarray] = None,
) -> np.ndarray:
    """User/context embedding from a listening history: the query tower
    applied to the (optionally weighted) mean of liked items' features —
    the standard cold-start-free profile for feature-based two-towers.
    Returns (D,)."""
    feats = np.asarray(liked_item_features, np.float32)
    if feats.ndim != 2 or len(feats) == 0:
        raise ValueError("liked_item_features must be a non-empty (n, F) array")
    if weights is not None:
        w = np.asarray(weights, np.float32)
        profile = (feats * w[:, None]).sum(0) / max(w.sum(), 1e-9)
    else:
        profile = feats.mean(0)
    return embed_queries(params, profile[None, :], config)[0]


def save_model(
    path: str, params: Dict, config: TwoTowerConfig, feat_dim: Optional[int] = None
) -> None:
    """Save as an npz container: flax-msgpack param bytes + JSON config.

    No pickle anywhere — loading an untrusted model file must never
    execute code (np.load runs with allow_pickle=False), unlike a raw
    pickle artifact.  Written to the exact `path` (file-object form stops
    numpy appending '.npz')."""
    import json

    from flax import serialization

    if feat_dim is None:
        # recover the input width from the first Dense kernel
        first = params["params"]["query_tower"]["Dense_0"]["kernel"]
        feat_dim = int(first.shape[0])
    blob = serialization.to_bytes(params)
    with open(path, "wb") as f:
        np.savez_compressed(
            f,
            format_version=np.int32(2),
            params_msgpack=np.frombuffer(blob, np.uint8),
            config_json=np.str_(json.dumps(dataclasses.asdict(config))),
            feat_dim=np.int32(feat_dim),
        )
    log.info("two-tower model saved: %s", path)


def load_model(path: str) -> Tuple[Dict, TwoTowerConfig]:
    import json

    from flax import serialization

    with np.load(path, allow_pickle=False) as z:
        config_raw = json.loads(str(z["config_json"][()]))
        feat_dim = int(z["feat_dim"])
        param_bytes = z["params_msgpack"].tobytes()
    cfg = dict(config_raw)
    if "hidden_dims" in cfg:
        cfg["hidden_dims"] = tuple(cfg["hidden_dims"])
    config = TwoTowerConfig(**cfg)
    model = TwoTower(config)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, feat_dim)),
        jnp.zeros((1, feat_dim)),
    )
    params = serialization.from_bytes(template, param_bytes)
    return params, config


def train_from_cli(
    catalog_path: str,
    config: TwoTowerConfig,
    output: str,
    mesh: Optional[Mesh] = None,
    checkpoint_dir: Optional[str] = None,
    interactions_path: Optional[str] = None,
) -> int:
    from spotify_recommender_tpu.data.catalog import Catalog

    cat = Catalog.load(catalog_path)
    pair_fn = None
    if interactions_path:
        # collaborative positives (co-listen pairs) instead of the
        # default same-genre self-supervision
        from spotify_recommender_tpu.models import mf as mf_mod

        inter = mf_mod.load_interactions(interactions_path)
        if inter.num_items > len(cat):
            print(
                f"Error: interactions reference item {inter.num_items - 1} "
                f"but the catalog has only {len(cat)} rows",
                file=__import__("sys").stderr,
            )
            return 1
        pair_fn = colisten_pair_fn(
            inter, cat.features, np.random.default_rng(config.seed)
        )
    result = train(
        cat.features, cat.genre_ids, config,
        mesh=mesh, pair_fn=pair_fn, checkpoint_dir=checkpoint_dir,
    )
    save_model(output, result.params, config)
    print(f"two-tower trained: final loss {result.losses[-1]:.4f}")
    return 0


def evaluate_colisten(
    params: Dict,
    config: TwoTowerConfig,
    features: np.ndarray,
    interactions,
    k: int = 10,
    holdout: int = 1,
    seed: int = 0,
    max_eval_users: int = 10_000,
) -> Dict[str, float]:
    """recall@k / NDCG@k of a two-tower model on held-out co-listen pairs.

    For each eligible user one interaction is held out; the QUERY is the
    tower embedding of another item the user played, and the model must
    rank the held-out item (scored through the same chunked MIPS stack
    that serves retrieval, with the user's remaining items excluded)."""
    from spotify_recommender_tpu.models.mf import (
        evaluate_ranking_arrays,
        split_leave_k_out_arrays,
    )

    train_i, held_idx, held_mask, seen_idx, seen_mask = (
        split_leave_k_out_arrays(interactions, k=holdout, seed=seed)
    )
    item_emb = embed_catalog(params, features, config)
    rng = np.random.default_rng(seed)
    eligible = np.nonzero(held_mask.any(axis=1) & train_i.mask.any(axis=1))[0]
    if len(eligible) == 0:
        raise ValueError("no users with both train and held-out items")
    eval_users = rng.choice(
        eligible, size=min(max_eval_users, len(eligible)), replace=False
    )
    # query = tower embedding of one TRAIN item per user
    deg = train_i.mask[eval_users].sum(axis=1)
    pick = rng.integers(0, deg)
    q_rows = train_i.item_idx[eval_users, pick]
    q_emb = embed_queries(params, features[q_rows], config)
    return evaluate_ranking_arrays(
        np.asarray(q_emb),
        item_emb,
        np.arange(len(eval_users)),
        held_idx[eval_users],
        held_mask[eval_users],
        k=k,
        seen_idx=seen_idx[eval_users],
        seen_mask=seen_mask[eval_users],
    )


def dryrun_train_step(mesh: Mesh) -> None:
    """Graft-driver hook: one data-parallel train step on tiny shapes over
    all devices of `mesh` (re-laid out onto a pure 'data' axis)."""
    devices = np.asarray(mesh.devices).reshape(-1)
    dp_mesh = Mesh(devices.reshape(len(devices), 1), ("data", "model"))
    n = len(devices)
    config = TwoTowerConfig(
        embedding_dim=8, hidden_dims=(16,), batch_size=4 * n, num_steps=1
    )
    rng = np.random.default_rng(0)
    feats = rng.random((64, 12)).astype(np.float32)
    genres = rng.integers(0, 4, size=64).astype(np.int32)
    result = train(feats, genres, config, mesh=dp_mesh)
    assert np.isfinite(result.losses[-1])

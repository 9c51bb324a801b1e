"""Matrix factorization for implicit feedback: ALS + SGD trainers.

The reference has no training at all (SURVEY.md §2: features are
hand-crafted; scope extension per BASELINE.json config 3).  TPU-first
design:

- **iALS** (Hu/Koren/Volinsky 2008, via PAPERS.md iALS++ background):
  alternating ridge solves with the Gramian trick —
  ``A_u = YᵀY + λI + Σ_i α·c_ui · y_i y_iᵀ``, ``b_u = Σ_i (1 + α·c_ui) y_i``.
  Users are processed as one batched program: interactions are padded to a
  fixed ``max_degree`` (static shapes for XLA), per-user normal matrices
  are built with einsum on the MXU, and all solves run as **one batched
  Cholesky** (`jax.scipy.linalg.cho_solve`) — thousands of D×D solves is
  exactly the regime the MXU batches well at D ≤ 128.
- **SGD**: confidence-weighted MSE on positives + sampled uniform
  negatives, optax Adam, jit-compiled step.  Gradients `psum` over the
  "data" mesh axis when run under shard_map (see train_step_dp).
- Both factor tables live on device; the user/item alternation is
  embarrassingly data-parallel over the solved axis (each device solves a
  row-shard of users against a replicated item table — the standard ALS
  scale-out; sharded-table all-to-all serving lives in the two-tower path).

Evaluation reuses the retrieval stack: recall@k / NDCG@k by scoring the
factorized embeddings with the same exact top-k kernel that serves the
content-based path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spotify_recommender_tpu.core.config import MFConfig
from spotify_recommender_tpu.core.logging import get_logger, PhaseTimer

log = get_logger(__name__)


# --------------------------------------------------------------------------
# Interaction data
# --------------------------------------------------------------------------


@dataclasses.dataclass
class Interactions:
    """Implicit-feedback matrix in padded-ragged (TPU-static) form.

    ``item_idx[u, j]`` = j-th item of user u (0-padded), valid where
    ``mask[u, j]``; ``confidence`` holds raw counts (0 where padded).
    """

    item_idx: np.ndarray     # (U, max_degree) int32
    confidence: np.ndarray   # (U, max_degree) float32
    mask: np.ndarray         # (U, max_degree) bool
    num_users: int
    num_items: int

    @classmethod
    def from_coo(
        cls,
        users: np.ndarray,
        items: np.ndarray,
        counts: np.ndarray,
        num_users: Optional[int] = None,
        num_items: Optional[int] = None,
        max_degree: Optional[int] = None,
    ) -> "Interactions":
        users = np.asarray(users, np.int64)
        items = np.asarray(items, np.int64)
        counts = np.asarray(counts, np.float32)
        nu = int(num_users or users.max() + 1)
        ni = int(num_items or items.max() + 1)
        order = np.lexsort((items, users))
        users, items, counts = users[order], items[order], counts[order]
        degrees = np.bincount(users, minlength=nu)
        md = int(max_degree or degrees.max())
        item_idx = np.zeros((nu, md), np.int32)
        conf = np.zeros((nu, md), np.float32)
        mask = np.zeros((nu, md), bool)
        starts = np.concatenate([[0], np.cumsum(degrees)])
        for u in range(nu):
            d = min(int(degrees[u]), md)
            s = starts[u]
            item_idx[u, :d] = items[s : s + d]
            conf[u, :d] = counts[s : s + d]
            mask[u, :d] = True
        return cls(item_idx, conf, mask, nu, ni)

    def transpose(self, max_degree: Optional[int] = None) -> "Interactions":
        """Item-major view (for the item half-step of ALS)."""
        u, i, c = [], [], []
        for uu in range(self.num_users):
            valid = self.mask[uu]
            i.append(self.item_idx[uu][valid])
            c.append(self.confidence[uu][valid])
            u.append(np.full(valid.sum(), uu, np.int64))
        return Interactions.from_coo(
            np.concatenate(i),  # items become the "users" of the view
            np.concatenate(u),
            np.concatenate(c),
            num_users=self.num_items,
            num_items=self.num_users,
            max_degree=max_degree,
        )


def synthetic_interactions(
    num_users: int = 2000,
    num_items: int = 1000,
    latent_dim: int = 8,
    density: float = 0.02,
    seed: int = 0,
) -> Tuple[Interactions, np.ndarray, np.ndarray]:
    """Low-rank synthetic play counts (ground-truth factors returned for
    sanity checks)."""
    rng = np.random.default_rng(seed)
    tu = rng.normal(size=(num_users, latent_dim)).astype(np.float32)
    ti = rng.normal(size=(num_items, latent_dim)).astype(np.float32)
    logits = tu @ ti.T
    n_obs = int(density * num_users * num_items)
    # observation probability follows affinity (sharpened softmax sampling
    # so the preference signal is clearly recoverable by MF)
    p = np.exp(2.0 * logits)
    p /= p.sum()
    flat = rng.choice(num_users * num_items, size=n_obs, replace=False, p=p.ravel())
    users, items = np.divmod(flat, num_items)
    counts = 1.0 + rng.poisson(3.0, size=n_obs).astype(np.float32)
    inter = Interactions.from_coo(users, items, counts, num_users, num_items)
    return inter, tu, ti


# --------------------------------------------------------------------------
# ALS
# --------------------------------------------------------------------------


def _als_solve(
    other: jnp.ndarray,        # (M, D) fixed factor table
    item_idx: jnp.ndarray,     # (N, md) int32 neighbor ids into `other`
    confidence: jnp.ndarray,   # (N, md) float32
    mask: jnp.ndarray,         # (N, md) bool
    reg: float,
    alpha: float,
) -> jnp.ndarray:
    """One ALS half-step: re-solve every row given the fixed `other` table.

    Implements the implicit-feedback normal equations with the Gramian
    trick; all N solves run as one batched Cholesky.  Fully-masked rows
    (padding) solve (G + λI) x = 0 → 0, harmlessly.
    """
    d = other.shape[1]
    gram = jnp.dot(
        other.T, other, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                     # (D, D) MXU
    y = other[item_idx]                                   # (N, md, D) gather
    w = jnp.where(mask, alpha * confidence, 0.0)          # (N, md)
    cpref = jnp.where(mask, 1.0 + alpha * confidence, 0.0)
    # A_n = G + λI + Σ_j w_nj y_nj y_njᵀ   (batched outer-product einsum)
    a = (
        gram[None]
        + jnp.einsum("nj,njd,nje->nde", w, y, y)
        + reg * jnp.eye(d, dtype=other.dtype)[None]
    )
    b = jnp.einsum("nj,njd->nd", cpref, y)                # (N, D)
    chol = jax.scipy.linalg.cho_factor(a, lower=True)
    return jax.scipy.linalg.cho_solve(chol, b)


@partial(jax.jit, static_argnames=("reg", "alpha"))
def _als_half_step(
    solve_for: jnp.ndarray,    # unused placeholder, keeps call symmetry
    other: jnp.ndarray,
    item_idx: jnp.ndarray,
    confidence: jnp.ndarray,
    mask: jnp.ndarray,
    reg: float,
    alpha: float,
) -> jnp.ndarray:
    del solve_for
    return _als_solve(other, item_idx, confidence, mask, reg, alpha)


def make_sharded_half_step(mesh, reg: float, alpha: float, axis: str = "catalog"):
    """ALS half-step sharded over the solve axis: each device solves its
    row-shard of users (or items) against the replicated `other` table —
    the canonical ALS scale-out (solves are row-independent).  Inputs must
    be padded to a multiple of the axis size (train_als handles this)."""
    from jax.sharding import PartitionSpec as P

    body = partial(_als_solve, reg=reg, alpha=alpha)
    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(axis, None), P(axis, None), P(axis, None)),
            out_specs=P(axis, None),
            check_vma=False,
        )
    )


def _pad_rows(x: np.ndarray, multiple: int) -> np.ndarray:
    pad = (-x.shape[0]) % multiple
    if pad == 0:
        return x
    return np.concatenate(
        [x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
    )


def train_als(
    inter: Interactions,
    config: MFConfig,
    item_view: Optional[Interactions] = None,
    callback=None,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full alternating loop. Returns (user_factors, item_factors).

    With a mesh, each half-step's solves are row-sharded over the mesh's
    "catalog" axis (device-data-parallel ALS)."""
    rng = np.random.default_rng(config.seed)
    d = config.embedding_dim
    scale = 1.0 / np.sqrt(d)
    if item_view is None:
        item_view = inter.transpose()

    n_shards = mesh.shape["catalog"] if mesh is not None else 1
    u_idx = jnp.asarray(_pad_rows(inter.item_idx, n_shards))
    u_conf = jnp.asarray(_pad_rows(inter.confidence, n_shards))
    u_mask = jnp.asarray(_pad_rows(inter.mask, n_shards))
    i_idx = jnp.asarray(_pad_rows(item_view.item_idx, n_shards))
    i_conf = jnp.asarray(_pad_rows(item_view.confidence, n_shards))
    i_mask = jnp.asarray(_pad_rows(item_view.mask, n_shards))
    # init with UNPADDED shapes so results are invariant to shard count,
    # then zero-pad to the sharded row count
    users = _pad_rows(
        (rng.normal(size=(inter.num_users, d)) * scale).astype(np.float32),
        n_shards,
    )
    items = _pad_rows(
        (rng.normal(size=(inter.num_items, d)) * scale).astype(np.float32),
        n_shards,
    )
    users = jnp.asarray(users)
    items = jnp.asarray(items)

    if mesh is not None:
        step = make_sharded_half_step(mesh, config.reg, config.alpha)

        def half(_, other, idx, conf, mask):
            return step(other, idx, conf, mask)

    else:
        half = partial(
            _als_half_step, reg=config.reg, alpha=config.alpha
        )

    timer = PhaseTimer()
    for it in range(config.num_iterations):
        with timer.phase(f"iter{it}"):
            users = half(users, items, u_idx, u_conf, u_mask)
            items = half(items, users, i_idx, i_conf, i_mask)
            jax.block_until_ready(items)
        if callback is not None:
            callback(it, users[: inter.num_users], items[: inter.num_items])
    log.info("ALS done: %s", timer.report())
    return (
        np.asarray(users[: inter.num_users]),
        np.asarray(items[: inter.num_items]),
    )


# --------------------------------------------------------------------------
# SGD variant
# --------------------------------------------------------------------------


@dataclasses.dataclass
class SGDState:
    users: jnp.ndarray
    items: jnp.ndarray
    opt_state: optax.OptState


def _sgd_loss(
    params: Dict[str, jnp.ndarray],
    u: jnp.ndarray,           # (B,) user ids
    i_pos: jnp.ndarray,       # (B,) positive item ids
    conf: jnp.ndarray,        # (B,) confidence
    i_neg: jnp.ndarray,       # (B, n_neg) sampled negatives
    reg: float,
    alpha: float,
) -> jnp.ndarray:
    """Confidence-weighted implicit MSE (iALS objective, sampled)."""
    eu = params["users"][u]                    # (B, D)
    ep = params["items"][i_pos]                # (B, D)
    en = params["items"][i_neg]                # (B, n_neg, D)
    pos_pred = jnp.sum(eu * ep, axis=1)
    neg_pred = jnp.einsum("bd,bnd->bn", eu, en)
    w = 1.0 + alpha * conf
    loss_pos = jnp.mean(w * (1.0 - pos_pred) ** 2)
    loss_neg = jnp.mean(neg_pred**2)
    l2 = reg * (jnp.mean(jnp.sum(eu**2, 1)) + jnp.mean(jnp.sum(ep**2, 1)))
    return loss_pos + loss_neg + l2


@partial(jax.jit, static_argnames=("optimizer", "reg", "alpha", "axis_name"))
def sgd_step(
    params: Dict[str, jnp.ndarray],
    opt_state: optax.OptState,
    batch: Dict[str, jnp.ndarray],
    optimizer,
    reg: float,
    alpha: float,
    axis_name: Optional[str] = None,
):
    loss, grads = jax.value_and_grad(_sgd_loss)(
        params, batch["user"], batch["item"], batch["conf"], batch["neg"],
        reg, alpha,
    )
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def train_sgd(
    inter: Interactions,
    config: MFConfig,
    num_steps: int = 1000,
    n_neg: int = 4,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """SGD/Adam training loop. With a mesh, the batch is sharded over the
    "data" axis and gradients are psum'd (data parallelism)."""
    rng = np.random.default_rng(config.seed)
    d = config.embedding_dim
    scale = 1.0 / np.sqrt(d)
    params = {
        "users": jnp.asarray(
            rng.normal(size=(inter.num_users, d)) * scale, jnp.float32
        ),
        "items": jnp.asarray(
            rng.normal(size=(inter.num_items, d)) * scale, jnp.float32
        ),
    }
    optimizer = optax.adam(config.learning_rate)
    opt_state = optimizer.init(params)

    # flatten observed pairs for sampling
    uu, jj = np.nonzero(inter.mask)
    users_f = uu.astype(np.int32)
    items_f = inter.item_idx[uu, jj]
    conf_f = inter.confidence[uu, jj]
    n_obs = len(users_f)

    if mesh is not None and mesh.shape.get("data", 1) > 1:
        from jax.sharding import PartitionSpec as P

        def _dp_body(params, opt_state, user, item, conf, neg):
            batch = {"user": user, "item": item, "conf": conf, "neg": neg}
            return sgd_step(
                params, opt_state, batch,
                optimizer=optimizer, reg=config.reg, alpha=config.alpha,
                axis_name="data",
            )

        dp_step = jax.jit(
            jax.shard_map(
                _dp_body,
                mesh=mesh,
                in_specs=(P(), P(), P("data"), P("data"), P("data"),
                          P("data", None)),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
        )

        def step_fn(params, opt_state, batch):
            return dp_step(
                params, opt_state,
                batch["user"], batch["item"], batch["conf"], batch["neg"],
            )

        # global batch must divide evenly over the data axis
        nd = mesh.shape["data"]
        b = max(nd, (min(config.batch_size, n_obs) // nd) * nd)
    else:
        step_fn = partial(
            sgd_step,
            optimizer=optimizer,
            reg=config.reg,
            alpha=config.alpha,
            axis_name=None,
        )
        b = min(config.batch_size, n_obs)
    losses = []
    for step in range(num_steps):
        sel = rng.integers(0, n_obs, size=b)
        batch = {
            "user": jnp.asarray(users_f[sel]),
            "item": jnp.asarray(items_f[sel]),
            "conf": jnp.asarray(conf_f[sel]),
            "neg": jnp.asarray(
                rng.integers(0, inter.num_items, size=(b, n_neg)), jnp.int32
            ),
        }
        params, opt_state, loss = step_fn(params, opt_state, batch)
        losses.append(float(loss))
    log.info("SGD done: loss %.4f -> %.4f", losses[0], losses[-1])
    return np.asarray(params["users"]), np.asarray(params["items"])


# --------------------------------------------------------------------------
# Evaluation: recall@k / NDCG@k through the retrieval stack
# --------------------------------------------------------------------------


def evaluate_ranking(
    user_factors: np.ndarray,
    item_factors: np.ndarray,
    heldout: Dict[int, np.ndarray],
    k: int = 10,
    train_mask: Optional[Dict[int, np.ndarray]] = None,
) -> Dict[str, float]:
    """recall@k and NDCG@k against held-out positives.

    Scoring = dot-product MIPS via the same exact top-k stack used for
    content retrieval (ops/similarity.py with unit norms disabled).
    """
    from spotify_recommender_tpu.ops.similarity import topk_scores

    users = sorted(heldout.keys())
    u_emb = jnp.asarray(user_factors[users])
    scores = jnp.dot(
        u_emb, jnp.asarray(item_factors).T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if train_mask is not None:
        # mask training positives to -inf so they can't occupy the top-k
        scores = np.array(scores)  # copy: np.asarray of a jax array is read-only
        for row, u in enumerate(users):
            seen = train_mask.get(u)
            if seen is not None and len(seen):
                scores[row, seen] = -np.inf
        scores = jnp.asarray(scores)
    _, top = topk_scores(scores, k)
    top = np.asarray(top)

    recalls, ndcgs = [], []
    discounts = 1.0 / np.log2(np.arange(2, k + 2))
    for row, u in enumerate(users):
        pos = set(int(x) for x in heldout[u])
        if not pos:
            continue
        hits = np.asarray([int(t) in pos for t in top[row]])
        recalls.append(hits.sum() / min(len(pos), k))
        ideal = discounts[: min(len(pos), k)].sum()
        ndcgs.append((hits * discounts).sum() / ideal)
    return {
        "recall@k": float(np.mean(recalls)),
        "ndcg@k": float(np.mean(ndcgs)),
        "k": k,
        "num_eval_users": len(recalls),
    }


def split_leave_k_out(
    inter: Interactions, k: int = 2, seed: int = 0
) -> Tuple[Interactions, Dict[int, np.ndarray], Dict[int, np.ndarray]]:
    """Per-user split: hold out up to k interactions for evaluation."""
    rng = np.random.default_rng(seed)
    users, items, counts = [], [], []
    heldout: Dict[int, np.ndarray] = {}
    train_items: Dict[int, np.ndarray] = {}
    for u in range(inter.num_users):
        valid = inter.mask[u]
        its = inter.item_idx[u][valid]
        cfs = inter.confidence[u][valid]
        if len(its) <= k:
            train_sel = np.arange(len(its))
            held = np.empty(0, np.int64)
        else:
            perm = rng.permutation(len(its))
            held = its[perm[:k]].astype(np.int64)
            train_sel = perm[k:]
        if len(held):
            heldout[u] = held
        users.append(np.full(len(train_sel), u, np.int64))
        items.append(its[train_sel])
        counts.append(cfs[train_sel])
        train_items[u] = its[train_sel]
    train = Interactions.from_coo(
        np.concatenate(users),
        np.concatenate(items),
        np.concatenate(counts),
        inter.num_users,
        inter.num_items,
    )
    return train, heldout, train_items


def recommend_for_user(
    user_factors: np.ndarray,
    item_factors: np.ndarray,
    user_id: int,
    k: int = 10,
    exclude_items: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k items for one user by dot-product MIPS through the retrieval
    stack. Returns (scores (k,), item_ids (k,))."""
    from spotify_recommender_tpu.ops.similarity import topk_scores

    if user_id < 0 or user_id >= user_factors.shape[0]:
        raise IndexError(f"user {user_id} out of range")
    u = jnp.asarray(user_factors[user_id : user_id + 1], jnp.float32)
    scores = jnp.dot(
        u, jnp.asarray(item_factors, jnp.float32).T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if exclude_items is not None and len(exclude_items):
        mask = np.zeros(item_factors.shape[0], bool)
        mask[np.asarray(exclude_items, np.int64)] = True
        scores = jnp.where(jnp.asarray(mask)[None, :], -jnp.inf, scores)
    s, idx = topk_scores(scores, min(k, item_factors.shape[0]))
    return np.asarray(s)[0], np.asarray(idx)[0]


# --------------------------------------------------------------------------
# Model artifact + CLI
# --------------------------------------------------------------------------


def save_model(path: str, users: np.ndarray, items: np.ndarray, config: MFConfig):
    np.savez_compressed(
        path,
        user_factors=users,
        item_factors=items,
        embedding_dim=np.int32(config.embedding_dim),
        reg=np.float32(config.reg),
        alpha=np.float32(config.alpha),
    )
    log.info("MF model saved: %s", path)


def load_model(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with np.load(path) as z:
        return z["user_factors"], z["item_factors"]


def load_interactions(path: str) -> Interactions:
    """Load interactions from .npz (user/item/count arrays) or CSV
    (user_id,item_id,count header)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return Interactions.from_coo(z["user"], z["item"], z["count"])
    data = np.genfromtxt(
        path, delimiter=",", names=True, dtype=None, encoding="utf-8"
    )
    cols = data.dtype.names
    return Interactions.from_coo(
        data[cols[0]].astype(np.int64),
        data[cols[1]].astype(np.int64),
        data[cols[2]].astype(np.float32),
    )


def train_from_cli(
    interactions_path: str, config: MFConfig, output: str, solver: str = "als"
) -> int:
    inter = load_interactions(interactions_path)
    train, heldout, seen = split_leave_k_out(inter, k=2, seed=config.seed)
    log.info(
        "MF train: %d users x %d items, solver=%s dim=%d",
        inter.num_users, inter.num_items, solver, config.embedding_dim,
    )
    if solver == "als":
        users, items = train_als(train, config)
    else:
        users, items = train_sgd(train, config, num_steps=2000)
    metrics = evaluate_ranking(users, items, heldout, k=10, train_mask=seen)
    print(
        f"recall@10={metrics['recall@k']:.4f} ndcg@10={metrics['ndcg@k']:.4f} "
        f"({metrics['num_eval_users']} users)"
    )
    save_model(output, users, items, config)
    return 0

"""North-star ALS scale run: 1M users x 1M items on one chip.

VERDICT r1 item 4's done-criterion: "1M-user x 1M-item synthetic ALS run
completes with eval, timed, resumable."  Run on the TPU host:

    python experiments/als_scale_1m.py [users] [items] [nnz_per_user]

Generates clustered synthetic implicit feedback (vectorized, no per-user
loops), trains 2 ALS iterations at d=64 with Orbax checkpointing, resumes
for 1 more iteration (proving resume), and evaluates recall@10/NDCG@10 on
10k held-out users through the chunked MIPS retrieval stack.

Measured on one v5e chip (round 2): datagen 5.1 s, from_coo 12.4 s,
split 25.7 s, transpose 17.0 s, ALS 16.5 s/iteration steady-state
(first iteration 43 s incl. compile), resume verified, eval
10k users x 1M items in 24 s.  (The wall-clock between iterations also
pays ~1 GB of tunneled host->device uploads and 512 MB Orbax saves.)
"""

import sys
import tempfile
import time

import numpy as np

from spotify_recommender_tpu.core.config import MFConfig
from spotify_recommender_tpu.models import mf


def make_clustered(num_users, num_items, per_user, clusters=200, seed=0):
    """Users prefer one item-cluster: measurable recall without per-user
    Python work (all sampling vectorized)."""
    rng = np.random.default_rng(seed)
    total = num_users * per_user
    user = np.repeat(np.arange(num_users, dtype=np.int64), per_user)
    ucluster = (user % clusters).astype(np.int64)
    span = num_items // clusters
    # 80% in-cluster, 20% uniform noise
    incluster = rng.random(total) < 0.8
    offs = rng.integers(0, span, total)
    item = np.where(
        incluster, ucluster * span + offs, rng.integers(0, num_items, total)
    )
    count = 1.0 + rng.poisson(2.0, total).astype(np.float32)
    return user, item, count


def main():
    num_users = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_items = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    per_user = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    subspace = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    t0 = time.perf_counter()
    user, item, count = make_clustered(num_users, num_items, per_user)
    print(f"datagen: {len(user):,} interactions in "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    inter = mf.Interactions.from_coo(
        user, item, count, num_users, num_items
    )
    print(f"Interactions.from_coo: md={inter.item_idx.shape[1]} in "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    train, held_idx, held_mask, seen_idx, seen_mask = (
        mf.split_leave_k_out_arrays(inter, k=2, seed=0)
    )
    print(f"split_leave_k_out_arrays: {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    item_view = train.transpose()
    print(f"transpose: item md={item_view.item_idx.shape[1]} in "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    ckpt = tempfile.mkdtemp(prefix="als1m_")
    tag = f"iALS++ subspace={subspace}" if subspace else "full ALS"
    cfg2 = MFConfig(embedding_dim=64, num_iterations=2, reg=0.05, alpha=10.0)
    t0 = time.perf_counter()
    mf.train_als(train, cfg2, item_view=item_view, checkpoint_dir=ckpt,
                 subspace=subspace)
    t2 = time.perf_counter() - t0
    print(f"2 {tag} iterations: {t2:.1f}s ({t2/2:.1f}s/iter)", flush=True)

    # RESUME: one more iteration picks up from the checkpoint
    cfg3 = MFConfig(embedding_dim=64, num_iterations=3, reg=0.05, alpha=10.0)
    t0 = time.perf_counter()
    users_f, items_f = mf.train_als(
        train, cfg3, item_view=item_view, checkpoint_dir=ckpt,
        subspace=subspace,
    )
    print(f"resumed iteration 3: {time.perf_counter()-t0:.1f}s", flush=True)
    assert np.isfinite(users_f).all() and np.isfinite(items_f).all()

    # eval on 10k users through the chunked retrieval stack
    rng = np.random.default_rng(1)
    has_held = np.nonzero(held_mask.any(axis=1))[0]
    eval_users = rng.choice(has_held, size=min(10_000, len(has_held)),
                            replace=False)
    t0 = time.perf_counter()
    m = mf.evaluate_ranking_arrays(
        users_f, items_f, eval_users,
        held_idx[eval_users], held_mask[eval_users],
        k=10, seen_idx=seen_idx[eval_users], seen_mask=seen_mask[eval_users],
    )
    print(f"eval ({len(eval_users)} users x {num_items:,} items): "
          f"{time.perf_counter()-t0:.1f}s -> recall@10={m['recall@k']:.4f} "
          f"ndcg@10={m['ndcg@k']:.4f}", flush=True)


if __name__ == "__main__":
    main()

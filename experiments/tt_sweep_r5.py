"""Round-5: raise the two-tower quality tripwire off the floor.

BENCH_r04 recorded two_tower_recall_at_10 = 0.0945 (ALS: 0.59, random:
~0.01) — barely above random, useless as a regression guard (VERDICT r4
weak #4).  Sweep steps/lr/temperature/width on the EXACT bench workload
(benchmark.run_quality_row's construction, seed 0) to find a setting
with headroom, and probe the workload's ceiling with an item-item
latent-space kNN oracle.

Run: python experiments/tt_sweep_r5.py
"""

import itertools
import time

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

from spotify_recommender_tpu.core.config import MFConfig, TwoTowerConfig
from spotify_recommender_tpu.models import mf, two_tower


def main():
    seed = 0
    inter, _, _ = mf.synthetic_interactions(
        num_users=2000, num_items=1000, latent_dim=8, seed=seed
    )
    train_i, held_idx, held_mask, seen_idx, seen_mask = (
        mf.split_leave_k_out_arrays(inter, k=1, seed=seed)
    )
    users, items = mf.train_als(
        train_i,
        MFConfig(embedding_dim=16, num_iterations=6, reg=0.05, alpha=10.0,
                 seed=seed),
    )
    rng = np.random.default_rng(seed)
    feats = (items @ rng.standard_normal((items.shape[1], 12)) / 4.0
             ).astype(np.float32) + 0.05 * rng.standard_normal(
        (items.shape[0], 12)
    ).astype(np.float32)

    # ---- ceiling probe: perfect towers would recover item-item latent
    # geometry; score the held-out eval with RAW ALS ITEM embeddings as
    # the "tower" output (the information-theoretic best an item-to-item
    # retrieval can do on this workload)
    tm = two_tower.evaluate_colisten_embeddings(
        np.asarray(items, np.float32), inter, k=10, seed=seed,
    ) if hasattr(two_tower, "evaluate_colisten_embeddings") else None
    if tm is not None:
        print(f"ceiling (ALS item emb as towers): {tm}")

    grid = [
        # (steps, lr, temp, hidden, dim, batch)
        (200, 3e-3, 0.05, (32,), 16, 256),     # r4 prod
        (1000, 3e-3, 0.05, (32,), 16, 256),
        (2000, 3e-3, 0.05, (32,), 16, 256),
        (2000, 1e-3, 0.05, (32,), 16, 256),
        (2000, 3e-3, 0.1, (32,), 16, 256),
        (2000, 3e-3, 0.2, (32,), 16, 256),
        (2000, 3e-3, 0.05, (64, 32), 16, 256),
        (2000, 3e-3, 0.05, (32,), 32, 256),
        (4000, 3e-3, 0.1, (64, 32), 32, 512),
    ]
    for steps, lr, temp, hidden, dim, batch in grid:
        cfg = TwoTowerConfig(
            embedding_dim=dim, hidden_dims=hidden, batch_size=batch,
            num_steps=steps, learning_rate=lr, temperature=temp, seed=seed,
        )
        t0 = time.perf_counter()
        res = two_tower.train(
            feats, np.zeros(len(feats), np.int32), cfg,
            pair_fn=two_tower.colisten_pair_fn(
                train_i, feats, np.random.default_rng(seed)
            ),
        )
        dt = time.perf_counter() - t0
        m = two_tower.evaluate_colisten(
            res.params, cfg, feats, inter, k=10, seed=seed
        )
        print(
            f"steps={steps:5d} lr={lr:.0e} T={temp:.2f} h={hidden} "
            f"d={dim} b={batch}: recall@10={m['recall@k']:.4f} "
            f"ndcg={m['ndcg@k']:.4f}  ({dt:.0f}s)"
        )


if __name__ == "__main__":
    main()

"""Matrix-factorization trainers: ALS + SGD correctness and eval metrics."""

import numpy as np
import pytest

from spotify_recommender_tpu.core.config import MFConfig
from spotify_recommender_tpu.models import mf


@pytest.fixture(scope="module")
def tiny_data():
    inter, tu, ti = mf.synthetic_interactions(
        num_users=300, num_items=200, latent_dim=6, density=0.05, seed=1
    )
    return inter, tu, ti


class TestInteractions:
    def test_from_coo_padding(self):
        inter = mf.Interactions.from_coo(
            users=np.asarray([0, 0, 2]),
            items=np.asarray([5, 3, 1]),
            counts=np.asarray([2.0, 1.0, 4.0]),
            num_users=3,
            num_items=6,
        )
        assert inter.item_idx.shape == (3, 2)
        assert inter.mask[0].sum() == 2
        assert inter.mask[1].sum() == 0
        assert inter.mask[2].sum() == 1
        # user 0 items sorted by item id (lexsort)
        assert list(inter.item_idx[0]) == [3, 5]

    def test_transpose_round(self, tiny_data):
        inter, _, _ = tiny_data
        t = inter.transpose()
        assert t.num_users == inter.num_items
        assert t.mask.sum() == inter.mask.sum()


class TestALS:
    def test_training_improves_ranking(self, tiny_data):
        inter, _, _ = tiny_data
        train, heldout, seen = mf.split_leave_k_out(inter, k=1, seed=0)
        cfg = MFConfig(embedding_dim=16, num_iterations=6, reg=0.05, alpha=10.0)
        users, items = mf.train_als(train, cfg)
        assert users.shape == (inter.num_users, 16)
        assert np.isfinite(users).all() and np.isfinite(items).all()
        metrics = mf.evaluate_ranking(users, items, heldout, k=10, train_mask=seen)
        # random ranking recall@10 ~= 10/200 = 0.05; trained must beat it well
        assert metrics["recall@k"] > 0.35, metrics

    def test_reconstructs_observed_preferences(self, tiny_data):
        inter, _, _ = tiny_data
        cfg = MFConfig(embedding_dim=16, num_iterations=5, reg=0.05, alpha=20.0)
        users, items = mf.train_als(inter, cfg)
        scores = users @ items.T
        obs_u, slot = np.nonzero(inter.mask)
        obs_i = inter.item_idx[obs_u, slot]
        obs_mean = scores[obs_u, obs_i].mean()
        all_mean = scores.mean()
        assert obs_mean > all_mean + 0.3  # observed pairs score clearly higher


class TestSGD:
    def test_training_improves_ranking(self, tiny_data):
        inter, _, _ = tiny_data
        train, heldout, seen = mf.split_leave_k_out(inter, k=1, seed=0)
        cfg = MFConfig(
            embedding_dim=16, reg=0.002, alpha=5.0, learning_rate=0.05,
            batch_size=1024, seed=0,
        )
        users, items = mf.train_sgd(train, cfg, num_steps=400)
        metrics = mf.evaluate_ranking(users, items, heldout, k=10, train_mask=seen)
        assert metrics["recall@k"] > 0.12, metrics


class TestEvalMetrics:
    def test_perfect_and_zero_recall(self):
        items = np.eye(4, 4, dtype=np.float32)
        users = items.copy()
        heldout = {0: np.asarray([0]), 1: np.asarray([1])}
        m = mf.evaluate_ranking(users, items, heldout, k=1)
        assert m["recall@k"] == 1.0 and m["ndcg@k"] == 1.0
        heldout_bad = {0: np.asarray([3])}
        m = mf.evaluate_ranking(users, items, heldout_bad, k=1)
        assert m["recall@k"] == 0.0

    def test_train_mask_excludes_seen(self):
        # user 0 trained on item 0; with mask, item 0 cannot be retrieved
        users = np.asarray([[1.0, 0.0]], np.float32)
        items = np.asarray([[1.0, 0.0], [0.9, 0.1]], np.float32)
        m = mf.evaluate_ranking(
            users, items, {0: np.asarray([1])}, k=1,
            train_mask={0: np.asarray([0])},
        )
        assert m["recall@k"] == 1.0


class TestModelIO:
    def test_save_load_round_trip(self, tmp_path, tiny_data):
        inter, _, _ = tiny_data
        cfg = MFConfig(embedding_dim=8, num_iterations=1)
        users, items = mf.train_als(inter, cfg)
        p = str(tmp_path / "m.npz")
        mf.save_model(p, users, items, cfg)
        u2, i2 = mf.load_model(p)
        np.testing.assert_array_equal(users, u2)
        np.testing.assert_array_equal(items, i2)

    def test_load_interactions_npz(self, tmp_path):
        p = str(tmp_path / "inter.npz")
        np.savez(p, user=np.asarray([0, 1]), item=np.asarray([1, 0]),
                 count=np.asarray([1.0, 2.0]))
        inter = mf.load_interactions(p)
        assert inter.num_users == 2 and inter.num_items == 2


class TestIALSpp:
    """iALS++ subspace sweeps (arXiv:2110.14044)."""

    def test_full_subspace_equals_full_solve(self):
        """subspace == dim is one exact Gauss-Seidel step from the warm
        start = the full normal-equation solve."""
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        other = jnp.asarray(rng.standard_normal((500, 16)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 500, (800, 6)), jnp.int32)
        conf = jnp.asarray(rng.random((800, 6)), jnp.float32)
        mask = jnp.asarray(rng.random((800, 6)) < 0.8)
        x0 = jnp.asarray(rng.standard_normal((800, 16)) * 0.1, jnp.float32)
        full = mf._als_solve(other, idx, conf, mask, 0.1, 5.0)
        pp = mf._als_pp_solve(other, idx, conf, mask, x0, 0.1, 5.0,
                              subspace=16)
        np.testing.assert_allclose(
            np.asarray(pp), np.asarray(full), rtol=5e-4, atol=5e-5
        )

    def test_subspace_sweeps_converge_to_full_solution(self):
        """Repeated k=4 sweeps on a fixed quadratic must approach the
        full solve (block coordinate descent on a PD system)."""
        import jax.numpy as jnp

        rng = np.random.default_rng(1)
        other = jnp.asarray(rng.standard_normal((300, 16)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 300, (200, 8)), jnp.int32)
        conf = jnp.asarray(rng.random((200, 8)), jnp.float32)
        mask = jnp.asarray(np.ones((200, 8), bool))
        full = np.asarray(mf._als_solve(other, idx, conf, mask, 0.1, 5.0))
        x = jnp.zeros((200, 16), jnp.float32)
        for _ in range(12):
            x = mf._als_pp_solve(other, idx, conf, mask, x, 0.1, 5.0,
                                 subspace=4)
        np.testing.assert_allclose(np.asarray(x), full, rtol=2e-3, atol=2e-4)

    def test_train_als_with_subspace_learns(self):
        inter, _, _ = mf.synthetic_interactions(
            num_users=300, num_items=200, latent_dim=6, density=0.05, seed=1
        )
        train, heldout, seen = mf.split_leave_k_out(inter, k=1, seed=0)
        cfg = MFConfig(embedding_dim=16, num_iterations=10, reg=0.05,
                       alpha=10.0)
        users, items = mf.train_als(train, cfg, subspace=4)
        m = mf.evaluate_ranking(users, items, heldout, k=10, train_mask=seen)
        assert m["recall@k"] > 0.3, m

    def test_subspace_with_mesh_rejected(self):
        from spotify_recommender_tpu.core.config import MeshConfig
        from spotify_recommender_tpu.core.mesh import make_mesh

        inter, _, _ = mf.synthetic_interactions(
            num_users=40, num_items=30, latent_dim=4, density=0.1, seed=0
        )
        mesh = make_mesh(MeshConfig(data=1, catalog=8))
        with pytest.raises(ValueError, match="subspace"):
            mf.train_als(inter, MFConfig(embedding_dim=8, num_iterations=1),
                         mesh=mesh, subspace=4)

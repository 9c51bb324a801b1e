"""Device-sharded ALS must match the single-device solver."""

import numpy as np
import pytest

from spotify_recommender_tpu.core.config import MeshConfig, MFConfig
from spotify_recommender_tpu.core.mesh import make_mesh
from spotify_recommender_tpu.models import mf


class TestShardedALS:
    def test_matches_single_device(self):
        inter, _, _ = mf.synthetic_interactions(
            num_users=203, num_items=101, latent_dim=4, density=0.05, seed=7
        )
        cfg = MFConfig(embedding_dim=8, num_iterations=3, reg=0.1, alpha=10.0)
        u1, i1 = mf.train_als(inter, cfg)
        mesh = make_mesh(MeshConfig(data=1, catalog=8))
        u8, i8 = mf.train_als(inter, cfg, mesh=mesh)
        assert u8.shape == u1.shape and i8.shape == i1.shape
        np.testing.assert_allclose(u8, u1, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(i8, i1, rtol=2e-4, atol=2e-5)

    def test_sharded_learns(self):
        inter, _, _ = mf.synthetic_interactions(
            num_users=300, num_items=200, latent_dim=6, density=0.05, seed=1
        )
        train, heldout, seen = mf.split_leave_k_out(inter, k=1, seed=0)
        mesh = make_mesh(MeshConfig(data=1, catalog=8))
        cfg = MFConfig(embedding_dim=16, num_iterations=6, reg=0.05, alpha=10.0)
        users, items = mf.train_als(train, cfg, mesh=mesh)
        m = mf.evaluate_ranking(users, items, heldout, k=10, train_mask=seen)
        assert m["recall@k"] > 0.35, m


class TestShardedTableALS:
    """ALS with row-sharded factor TABLES (sharded-embedding exchange):
    nothing replicated, results must still match the replicated solver."""

    def test_matches_replicated(self):
        inter, _, _ = mf.synthetic_interactions(
            num_users=203, num_items=101, latent_dim=4, density=0.05, seed=7
        )
        cfg = MFConfig(embedding_dim=8, num_iterations=3, reg=0.1, alpha=10.0)
        u1, i1 = mf.train_als(inter, cfg)
        mesh = make_mesh(MeshConfig(data=1, catalog=8))
        u8, i8 = mf.train_als(inter, cfg, mesh=mesh, shard_tables=True)
        assert u8.shape == u1.shape and i8.shape == i1.shape
        np.testing.assert_allclose(u8, u1, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(i8, i1, rtol=2e-4, atol=2e-5)

    def test_table_stays_distributed(self):
        """No device may materialize the full factor tables during the
        sharded-table half-step (the point of the mode)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(MeshConfig(data=1, catalog=8))
        step = mf.make_sharded_table_half_step(mesh, reg=0.1, alpha=1.0)
        import jax.numpy as jnp

        other = jax.device_put(
            jnp.ones((64, 8)), NamedSharding(mesh, P("catalog", None))
        )
        idx = jax.device_put(
            jnp.zeros((64, 3), jnp.int32),
            NamedSharding(mesh, P("catalog", None)),
        )
        conf = jax.device_put(
            jnp.ones((64, 3)), NamedSharding(mesh, P("catalog", None))
        )
        mask = jax.device_put(
            jnp.ones((64, 3), bool), NamedSharding(mesh, P("catalog", None))
        )
        out = step(other, idx, conf, mask)
        assert out.sharding.spec == P("catalog", None)
        assert np.isfinite(np.asarray(out)).all()


class TestShardedSGD:
    def test_dp_sgd_learns(self):
        inter, _, _ = mf.synthetic_interactions(
            num_users=300, num_items=200, latent_dim=6, density=0.05, seed=2
        )
        train, heldout, seen = mf.split_leave_k_out(inter, k=1, seed=0)
        mesh = make_mesh(MeshConfig(data=8, catalog=1))
        cfg = MFConfig(embedding_dim=16, reg=0.002, alpha=5.0,
                       learning_rate=0.05, batch_size=1024, seed=0)
        users, items = mf.train_sgd(train, cfg, num_steps=300, mesh=mesh)
        m = mf.evaluate_ranking(users, items, heldout, k=10, train_mask=seen)
        assert m["recall@k"] > 0.12, m

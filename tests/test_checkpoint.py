"""Orbax checkpoint manager: save/restore/retention/resume."""

import jax.numpy as jnp
import numpy as np
import pytest

from spotify_recommender_tpu.train.checkpoint import (
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)


@pytest.fixture
def state():
    return {
        "params": {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones(4)},
        "step": jnp.asarray(7),
    }


class TestCheckpointManager:
    def test_save_restore_round_trip(self, tmp_path, state):
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        assert mgr.save(0, state)
        mgr.wait()
        out = mgr.restore(0, template=state)
        np.testing.assert_array_equal(out["params"]["w"], state["params"]["w"])
        assert int(out["step"]) == 7
        mgr.close()

    def test_latest_step_and_retention(self, tmp_path, state):
        mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
        for s in (1, 2, 3, 4):
            mgr.save(s, state, force=True)
        mgr.wait()
        assert mgr.latest_step() == 4
        # resume-from-latest
        out = mgr.restore(template=state)
        assert int(out["step"]) == 7
        mgr.close()

    def test_restore_empty_returns_none(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "empty"))
        assert mgr.restore() is None
        mgr.close()


class TestOneShot:
    def test_save_restore(self, tmp_path, state):
        p = str(tmp_path / "one")
        save_checkpoint(p, state)
        out = restore_checkpoint(p, template=state)
        np.testing.assert_array_equal(out["params"]["b"], state["params"]["b"])


class TestMFResume:
    """ALS / SGD-MF checkpoint + resume: an interrupted-then-resumed run
    must produce the same factors as an uninterrupted one."""

    def test_als_resume_matches_uninterrupted(self, tmp_path):
        from spotify_recommender_tpu.core.config import MFConfig
        from spotify_recommender_tpu.models import mf

        inter, _, _ = mf.synthetic_interactions(
            num_users=120, num_items=60, latent_dim=4, density=0.06, seed=3
        )
        cfg6 = MFConfig(embedding_dim=8, num_iterations=6, reg=0.1, alpha=5.0)
        u_ref, i_ref = mf.train_als(inter, cfg6)
        # interrupted: 3 iterations, checkpointed
        ck = str(tmp_path / "als")
        cfg3 = MFConfig(embedding_dim=8, num_iterations=3, reg=0.1, alpha=5.0)
        mf.train_als(inter, cfg3, checkpoint_dir=ck)
        # resumed: picks up at iteration 3, finishes 6
        u_res, i_res = mf.train_als(inter, cfg6, checkpoint_dir=ck)
        np.testing.assert_allclose(u_res, u_ref, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(i_res, i_ref, rtol=1e-4, atol=1e-6)

    def test_sgd_resume_matches_uninterrupted(self, tmp_path):
        from spotify_recommender_tpu.core.config import MFConfig
        from spotify_recommender_tpu.models import mf

        inter, _, _ = mf.synthetic_interactions(
            num_users=120, num_items=60, latent_dim=4, density=0.06, seed=4
        )
        cfg = MFConfig(embedding_dim=8, reg=0.01, alpha=2.0,
                       learning_rate=0.05, batch_size=256, seed=0)
        u_ref, i_ref = mf.train_sgd(inter, cfg, num_steps=40)
        ck = str(tmp_path / "sgd")
        mf.train_sgd(inter, cfg, num_steps=20, checkpoint_dir=ck,
                     checkpoint_every=10)
        u_res, i_res = mf.train_sgd(inter, cfg, num_steps=40,
                                    checkpoint_dir=ck, checkpoint_every=10)
        np.testing.assert_allclose(u_res, u_ref, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(i_res, i_ref, rtol=1e-4, atol=1e-6)

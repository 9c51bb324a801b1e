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

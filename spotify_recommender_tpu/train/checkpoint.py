"""Checkpoint / resume for training state.

The reference's only persistence is its binary catalog ("preprocess once,
reload forever", reference DataManager.cpp:315-409 — covered by
data/catalog.py).  Training state (factor tables, tower params, optimizer
state) checkpoints through Orbax, which handles sharded arrays natively —
params saved from a mesh restore onto the same (or a compatible) mesh
without host round-trips.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

from spotify_recommender_tpu.core.logging import get_logger

log = get_logger(__name__)


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager: step-numbered checkpoints,
    keep-last-N retention, resume-from-latest."""

    def __init__(self, directory: str, max_to_keep: int = 3) -> None:
        self.directory = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        if saved:
            log.info("checkpoint saved: step %d -> %s", step, self.directory)
        return saved

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def save_checkpoint(path: str, state: Any) -> None:
    """One-shot checkpoint save (no retention management)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state)
    ckptr.wait_until_finished()
    log.info("checkpoint saved: %s", path)


def restore_checkpoint(path: str, template: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), template)
    return ckptr.restore(os.path.abspath(path))

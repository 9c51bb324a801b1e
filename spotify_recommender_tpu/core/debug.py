"""Numerical-debugging helpers.

SURVEY.md §5 race-detection/sanitizer notes: JAX's functional purity removes
data races by construction (the reference needed `omp critical` around its
genre map, DataManager.cpp:244-251); what remains worth guarding is
numerics — NaN propagation in training and nondeterministic cross-shard
reductions.

- `nan_guard()` — enable `jax_debug_nans` for a scope (every jit output is
  checked; raises at the op that produced the NaN);
- `assert_finite(tree)` — fail-fast check for pytrees of arrays, usable
  inside training loops at negligible cost;
- determinism notes: all top-k merges in this codebase tie-break by global
  index (ops/topk.py), so retrieval results are bit-stable across shard
  layouts; psum/pmean reductions follow XLA's fixed reduction order within
  a fixed mesh, so training is run-to-run deterministic for a fixed mesh
  and seed.
"""

from __future__ import annotations

import contextlib
from typing import Any, Iterator

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def nan_guard() -> Iterator[None]:
    """Enable jax_debug_nans within the scope."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree: Any, name: str = "tree") -> None:
    """Raise ValueError naming the first non-finite leaf."""
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating) and not bool(
            jnp.isfinite(arr).all()
        ):
            raise ValueError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )

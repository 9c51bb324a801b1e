"""Large-scale correctness runs (opt-in: SRT_SCALE_TESTS=1).

These validate north-star-scale behavior on the virtual 8-device CPU
mesh — too slow for the default suite, run explicitly:

    SRT_SCALE_TESTS=1 python -m pytest tests/test_scale.py -q
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SRT_SCALE_TESTS") != "1",
    reason="scale tests are opt-in (SRT_SCALE_TESTS=1)",
)


class TestSharded10M:
    def test_sharded_retrieval_matches_oracle_at_10m(self):
        """BASELINE config 4: 10M-item catalog row-sharded over 8 devices;
        partial top-k + allgather merge must equal the single-device
        oracle (global indices, lowest-index ties)."""
        import jax.numpy as jnp

        from spotify_recommender_tpu.core.config import MeshConfig
        from spotify_recommender_tpu.core.mesh import make_mesh
        from spotify_recommender_tpu.ops.similarity import exact_topk_chunked
        from spotify_recommender_tpu.parallel.sharding import ShardedCatalog

        rng = np.random.default_rng(0)
        n = 10_000_000 + 13
        feats = rng.random((n, 12), dtype=np.float32)
        norms = np.linalg.norm(feats, axis=1).astype(np.float32)
        mesh = make_mesh(MeshConfig(data=1, catalog=8))
        sc = ShardedCatalog(feats, norms, mesh)
        rows = rng.integers(0, n, 32).astype(np.int32)
        q = jnp.asarray(feats[rows])
        s, i = sc.retrieve(q, k=10, exclude_rows=jnp.asarray(rows))
        rs, ri = exact_topk_chunked(
            q, jnp.asarray(feats), jnp.asarray(norms),
            exclude_rows=jnp.asarray(rows), k=10,
        )
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


class TestChunkedALS:
    def test_blocked_solve_equals_unblocked(self):
        """The lax.map-blocked ALS half-step (memory-bounded path for
        north-star user counts) must match the single-block solve."""
        import jax.numpy as jnp

        from spotify_recommender_tpu.models.mf import _als_solve

        rng = np.random.default_rng(1)
        other = jnp.asarray(rng.standard_normal((5000, 32)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 5000, (20_000, 12)), jnp.int32)
        conf = jnp.asarray(rng.random((20_000, 12)), jnp.float32)
        mask = jnp.asarray(rng.random((20_000, 12)) < 0.8)
        full = _als_solve(other, idx, conf, mask, 0.1, 5.0,
                          solve_block=20_000)
        blocked = _als_solve(other, idx, conf, mask, 0.1, 5.0,
                             solve_block=1536)
        np.testing.assert_allclose(
            np.asarray(blocked), np.asarray(full), rtol=2e-5, atol=1e-6
        )

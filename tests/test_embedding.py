"""Row-sharded embedding table lookup on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spotify_recommender_tpu.core.config import MeshConfig
from spotify_recommender_tpu.core.mesh import make_mesh
from spotify_recommender_tpu.parallel.embedding import ShardedEmbeddingTable


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(MeshConfig(data=1, catalog=8))


class TestShardedEmbedding:
    def test_lookup_matches_dense(self, mesh8):
        rng = np.random.default_rng(0)
        table = rng.standard_normal((1000, 32)).astype(np.float32)
        t = ShardedEmbeddingTable(table, mesh8)
        ids = np.asarray([0, 999, 500, 123, 123, 7], np.int32)
        out = np.asarray(t.lookup(jnp.asarray(ids)))
        np.testing.assert_allclose(out, table[ids], rtol=1e-6)

    def test_unaligned_vocab_padding(self, mesh8):
        rng = np.random.default_rng(1)
        table = rng.standard_normal((1003, 16)).astype(np.float32)
        t = ShardedEmbeddingTable(table, mesh8)
        assert t.padded_vocab % 8 == 0
        ids = np.arange(1003, dtype=np.int32)[::7]
        out = np.asarray(t.lookup(jnp.asarray(ids)))
        np.testing.assert_allclose(out, table[ids], rtol=1e-6)

    def test_gradients_flow_to_owner_shard(self, mesh8):
        # d(sum of looked-up rows)/d(table) must be a scatter of ones into
        # exactly the looked-up rows
        from functools import partial
        from jax.sharding import PartitionSpec as P
        from spotify_recommender_tpu.parallel.embedding import local_lookup

        table = np.ones((64, 8), np.float32)
        ids = jnp.asarray([3, 17, 63], jnp.int32)

        fn = jax.jit(
            jax.shard_map(
                partial(local_lookup, axis_name="catalog"),
                mesh=mesh8,
                in_specs=(P("catalog", None), P()),
                out_specs=P(),
                check_vma=False,
            )
        )

        def loss(tbl):
            return jnp.sum(fn(tbl, ids))

        g = np.asarray(jax.grad(loss)(jnp.asarray(table)))
        expected = np.zeros_like(table)
        expected[[3, 17, 63]] = 1.0
        np.testing.assert_allclose(g, expected, rtol=1e-6)

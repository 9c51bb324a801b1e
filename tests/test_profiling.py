"""Profiling + distributed helpers smoke tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from spotify_recommender_tpu.core.profiling import annotate, timed, trace
from spotify_recommender_tpu.parallel.distributed import global_mesh


class TestTimed:
    def test_timed_returns_median_and_output(self):
        t, out = timed(lambda x: x * 2, jnp.ones(8), iters=3, warmup=1)
        assert t >= 0
        np.testing.assert_array_equal(np.asarray(out), 2 * np.ones(8))


class TestAnnotate:
    def test_annotation_scope(self):
        with annotate("test-span"):
            _ = jnp.arange(4).sum()


class TestTrace:
    def test_trace_writes_files(self, tmp_path):
        d = str(tmp_path / "trace")
        with trace(d):
            jnp.ones(16).sum().block_until_ready()
        import os

        assert os.path.isdir(d)


class TestGlobalMesh:
    def test_default_layout(self):
        mesh = global_mesh()
        assert mesh.axis_names == ("data", "catalog")
        assert mesh.shape["catalog"] == 8

    def test_explicit_split(self):
        mesh = global_mesh(axis_sizes=(2, 4))
        assert mesh.shape == {"data": 2, "catalog": 4}

    def test_bad_sizes_rejected(self):
        with pytest.raises(ValueError):
            global_mesh(axis_sizes=(3, 4))

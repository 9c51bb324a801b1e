"""Numerical debug helpers."""

import jax.numpy as jnp
import numpy as np
import pytest

from spotify_recommender_tpu.core.debug import assert_finite, nan_guard


class TestAssertFinite:
    def test_passes_on_finite(self):
        assert_finite({"a": jnp.ones(3), "b": [jnp.zeros(2)]})

    def test_raises_on_nan_with_path(self):
        with pytest.raises(ValueError, match="params.*w"):
            assert_finite(
                {"params": {"w": jnp.asarray([1.0, np.nan])}}, name="params"
            )

    def test_ignores_int_arrays(self):
        assert_finite({"idx": jnp.arange(5)})


class TestNanGuard:
    def test_scope_toggles_flag(self):
        import jax

        assert not jax.config.jax_debug_nans
        with nan_guard():
            assert jax.config.jax_debug_nans
        assert not jax.config.jax_debug_nans

import sys
import jax, jax.numpy as jnp, numpy as np

B, N, F, C = 512, 500_000, 12, 32
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.random((N, F), dtype=np.float32))
q = jnp.asarray(rng.random((B, F), dtype=np.float32))
cand = jnp.asarray(rng.integers(0, N, size=(B, C)).astype(np.int32))

@jax.jit
def oracle_dots(q, feats, cand):
    dots = jnp.dot(q, feats.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.take_along_axis(dots, cand, axis=1)

@jax.jit
def rerank2d(q, feats, cand):
    cols = feats[cand.reshape(-1)].T                  # (F, B*C)
    dots = jnp.dot(q, cols, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)   # (B, B*C)
    # take each row's own block's diagonal entries
    bc = cand.shape[1]
    idx = (jnp.arange(B)[:, None] * bc + jnp.arange(bc)[None, :])
    return jnp.take_along_axis(dots, idx, axis=1)

a = np.asarray(oracle_dots(q, feats, cand))
b = np.asarray(rerank2d(q, feats, cand))
print(jax.default_backend(), "max |diff|:", np.abs(a-b).max(), "bitequal:", (a==b).all())

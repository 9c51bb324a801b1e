import jax, jax.numpy as jnp, numpy as np

B, N, F, C = 1024, 1_000_000, 12, 32
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.random((N, F), dtype=np.float32))
norms = jnp.linalg.norm(feats, axis=1)
q = jnp.asarray(rng.random((B, F), dtype=np.float32))
cand = jnp.asarray(rng.integers(0, N, size=(B, C)).astype(np.int32))

@jax.jit
def oracle_scores(q, feats, norms, cand):
    dots = jnp.dot(q, feats.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    qn = jnp.linalg.norm(q, axis=1)
    den = qn[:, None] * norms[None, :]
    sc = jnp.where(den > 1e-8, jnp.clip(dots / den, -1, 1), 0.0)
    return jnp.take_along_axis(sc, cand, axis=1)

@jax.jit
def rerank_scores(q, feats, norms, cand):
    rows = feats[cand]
    rn = norms[cand]
    qn = jnp.linalg.norm(q, axis=1)
    dots = jnp.einsum("bf,bcf->bc", q, rows,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    den = qn[:, None] * rn
    return jnp.where(den > 1e-8, jnp.clip(dots / den, -1, 1), 0.0)

a = np.asarray(oracle_scores(q, feats, norms, cand))
b = np.asarray(rerank_scores(q, feats, norms, cand))
d = np.abs(a - b)
print("max |oracle - rerank| on TPU:", d.max(), " equal:", (d == 0).all())
# also matmul-form rerank: q @ rows.T per batch via dot_general batch dims
@jax.jit
def rerank2(q, feats, norms, cand):
    rows = feats[cand]                     # (B, C, F)
    qn = jnp.linalg.norm(q, axis=1)
    dots = jax.lax.dot_general(
        q[:, None, :], rows,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)[:, 0, :]
    den = qn[:, None] * norms[cand]
    return jnp.where(den > 1e-8, jnp.clip(dots / den, -1, 1), 0.0)
c2 = np.asarray(rerank2(q, feats, norms, cand))
d2 = np.abs(a - c2)
print("max |oracle - rerank2| on TPU:", d2.max(), " equal:", (d2 == 0).all())

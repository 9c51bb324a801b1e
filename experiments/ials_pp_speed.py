"""iALS++ vs full ALS wall-clock at scale (one chip)."""
import time
import jax.numpy as jnp, numpy as np
from spotify_recommender_tpu.models import mf

rng = np.random.default_rng(0)
U, I, PER, D = 400_000, 200_000, 16, 64
user = np.repeat(np.arange(U, dtype=np.int64), PER)
item = rng.integers(0, I, U * PER)
count = 1.0 + rng.poisson(2.0, U * PER).astype(np.float32)
inter = mf.Interactions.from_coo(user, item, count, U, I)
other = jnp.asarray(rng.standard_normal((I, D)) * 0.1, jnp.float32)
idx = jnp.asarray(inter.item_idx)
conf = jnp.asarray(inter.confidence)
mask = jnp.asarray(inter.mask)
x0 = jnp.asarray(rng.standard_normal((U, D)) * 0.1, jnp.float32)

def timeit(fn, n=3):
    out = fn(); out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(out[0, 0])
    return (time.perf_counter() - t0) / n

t_full = timeit(lambda: mf._als_half_step(x0, other, idx, conf, mask, 0.05, 10.0))
print(f"full ALS half-step ({U:,} x {I:,}, d={D}):      {t_full:6.2f} s", flush=True)
for k in (32, 16, 8):
    t_pp = timeit(lambda: mf._als_pp_half_step(x0, other, idx, conf, mask, 0.05, 10.0, k))
    print(f"iALS++ half-step subspace={k:2d}:                 {t_pp:6.2f} s  ({t_full/t_pp:.2f}x)", flush=True)

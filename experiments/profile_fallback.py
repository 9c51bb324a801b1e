import time
import jax, jax.numpy as jnp, numpy as np
from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.ops.pallas.fused_topk import CertifiedRetriever, _certified_retrieve
from spotify_recommender_tpu.ops.similarity import exact_topk_iterative

B, N, F, K = 1024, 1_000_000, 12, 10
rng = np.random.default_rng(0)
feats = rng.random((N, F), dtype=np.float32)
norms = np.linalg.norm(feats, axis=1).astype(np.float32)
q = feats[rng.integers(0, N, B)]
excl = jnp.asarray(np.full(B, -1, np.int32))
dq = jnp.asarray(q)
cr = CertifiedRetriever(feats, norms)

# 1. certified jit alone (ignore ok)
def chain_jit(n):
    t0 = time.perf_counter()
    cur = dq
    for _ in range(n):
        s, i, ok = _certified_retrieve(cur, cr.features_t2, cr.norms_row,
            cr.features32, cr.norms1d, excl, cr._valid,
            k=K, c=32, tq=512, tc=cr.tc, w=cr.w, eps=1e-8, ceps=2e-5)
        cur = dq + 0.0 * s[0, 0]
    float(s[0, 0])
    return (time.perf_counter() - t0) / n
chain_jit(1)
print(f"certified-jit only: {chain_jit(20)*1e3:.2f} ms", flush=True)

# 2. iterative fallback alone at B=24
qb = dq[:24]
eb = excl[:24]
def chain_fb(n):
    t0 = time.perf_counter()
    cur = qb
    for _ in range(n):
        fs, fi = exact_topk_iterative(cur, cr.features32, cr.norms1d,
                                      exclude_rows=eb, k=K)
        cur = qb + 0.0 * fs[0, 0]
    float(fs[0, 0])
    return (time.perf_counter() - t0) / n
chain_fb(1)
print(f"iterative fallback B=24: {chain_fb(10)*1e3:.2f} ms", flush=True)

# 3. full __call__ (with sync + splice)
def chain_call(n):
    t0 = time.perf_counter()
    cur = dq
    for _ in range(n):
        s, i = cr(cur, K, excl)
        cur = dq + 0.0 * s[0, 0]
    float(s[0, 0])
    return (time.perf_counter() - t0) / n
chain_call(1)
print(f"full __call__: {chain_call(10)*1e3:.2f} ms  fallbacks={cr.fallbacks}", flush=True)

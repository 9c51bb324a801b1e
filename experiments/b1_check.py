import time
import jax.numpy as jnp, numpy as np
from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.ops.pallas.fused_topk import CertifiedRetriever

N = 10_000_000
rng = np.random.default_rng(0)
feats = rng.random((N, 12), dtype=np.float32)
norms = np.linalg.norm(feats, axis=1).astype(np.float32)
cr = CertifiedRetriever(feats, norms, sync_check=False)  # default cfg
q = jnp.asarray(feats[:1])
excl = jnp.asarray(np.full(1, -1, np.int32))
def chain(n):
    t0 = time.perf_counter()
    cur = q
    for _ in range(n):
        s, i = cr(cur, 10, excl)
        cur = q + 0.0 * s[0, 0]
    float(s[0, 0])
    return (time.perf_counter() - t0) / n
chain(1)
print(f"B=1 @10M default cfg (auto tc={cr.tc_small}): {chain(10)*1e3:.2f} ms  overflow={cr.verify_no_overflow()}")
# batched sanity at same retriever (tc=8192 path)
qb = jnp.asarray(feats[rng.integers(0, N, 1024)])
eb = jnp.asarray(np.full(1024, -1, np.int32))
def chainb(n):
    t0 = time.perf_counter()
    cur = qb
    for _ in range(n):
        s, i = cr(cur, 10, eb)
        cur = qb + 0.0 * s[0, 0]
    float(s[0, 0])
    return (time.perf_counter() - t0) / n
chainb(1)
print(f"B=1024 @10M same retriever: {chainb(5)*1e3:.2f} ms  overflow={cr.verify_no_overflow()}")

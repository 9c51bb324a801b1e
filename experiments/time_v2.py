import time, sys
import jax, jax.numpy as jnp, numpy as np
from spotify_recommender_tpu.ops.pallas.fused_topk import FusedRetriever
from spotify_recommender_tpu.core.config import RetrievalConfig

B, N, F, K = 1024, 1_000_000, 12, 10
rng = np.random.default_rng(0)
feats = rng.random((N, F), dtype=np.float32)
norms = np.linalg.norm(feats, axis=1).astype(np.float32)
q = feats[rng.integers(0, N, B)]
excl = jnp.asarray(np.full(B, -1, np.int32))

for mode, cfg in [
    ("exact_f32", RetrievalConfig()),
    ("fast_bf16", RetrievalConfig(dtype="bfloat16", exact_scores=False)),
]:
    fr = FusedRetriever(feats, norms, cfg)
    dq = jnp.asarray(q)
    def chain(n):
        t0 = time.perf_counter()
        cur = dq
        for _ in range(n):
            s, i = fr(cur, K, excl)
            cur = dq + 0.0 * s[0, 0]
        float(s[0, 0])
        return (time.perf_counter() - t0) / n
    t0 = time.perf_counter(); chain(1); comp = time.perf_counter() - t0
    d1, d2 = chain(20), chain(20)
    print(f"{mode:12s} {d1*1e3:7.2f}/{d2*1e3:7.2f} ms  ({B/min(d1,d2):,.0f} qps) compile {comp:.0f}s", flush=True)

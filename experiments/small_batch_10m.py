import time, sys
import jax, jax.numpy as jnp, numpy as np
from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.ops.pallas.fused_topk import CertifiedRetriever

N, F, K = 10_000_000, 12, 10
rng = np.random.default_rng(0)
feats = rng.random((N, F), dtype=np.float32)
norms = np.linalg.norm(feats, axis=1).astype(np.float32)

for B, tc in [(1, 8192), (1, 65536), (1, 262144), (16, 65536)]:
    cfg = RetrievalConfig(catalog_tile=tc)
    cr = CertifiedRetriever(feats, norms, cfg, sync_check=False)
    q = jnp.asarray(feats[rng.integers(0, N, B)])
    excl = jnp.asarray(np.full(B, -1, np.int32))
    def chain(n):
        t0 = time.perf_counter()
        cur = q
        for _ in range(n):
            s, i = cr(cur, K, excl)
            cur = q + 0.0 * s[0, 0]
        float(s[0, 0])
        return (time.perf_counter() - t0) / n
    try:
        t0 = time.perf_counter(); chain(1); comp = time.perf_counter() - t0
        d = chain(10)
        gbps = (N * 24 * 2) / d / 1e9
        print(f"B={B} tc={tc}: {d*1e3:7.2f} ms  ({gbps:.0f} GB/s eff)  "
              f"overflow={cr.verify_no_overflow()} fb={cr.fallbacks} compile {comp:.0f}s", flush=True)
    except Exception as e:
        print(f"B={B} tc={tc}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)

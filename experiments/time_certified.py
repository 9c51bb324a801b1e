import time
import jax, jax.numpy as jnp, numpy as np
from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.ops.pallas.fused_topk import CertifiedRetriever
from spotify_recommender_tpu.ops.similarity import exact_topk_chunked

B, N, F, K = 1024, 1_000_000, 12, 10
rng = np.random.default_rng(0)
feats = rng.random((N, F), dtype=np.float32)
norms = np.linalg.norm(feats, axis=1).astype(np.float32)
q = feats[rng.integers(0, N, B)]
excl = jnp.asarray(np.full(B, -1, np.int32))
dq = jnp.asarray(q)

for qt, pf in [(512, 32), (512, 24), (256, 32)]:
    cr = CertifiedRetriever(feats, norms, RetrievalConfig(query_tile=qt, prefilter=pf), sync_check=False)
    def chain(n):
        t0 = time.perf_counter()
        cur = dq
        for _ in range(n):
            s, i = cr(cur, K, excl)
            cur = dq + 0.0 * s[0, 0]
        float(s[0, 0])
        return (time.perf_counter() - t0) / n
    t0 = time.perf_counter(); chain(1); comp = time.perf_counter() - t0
    d1, d2 = chain(20), chain(20)
    print(f"certified qt={qt} pf={pf} w={cr.w}: {d1*1e3:6.2f}/{d2*1e3:6.2f} ms "
          f"({B/min(d1,d2):,.0f} qps)  overflow={cr.verify_no_overflow()} fallbacks={cr.fallbacks}  compile {comp:.0f}s", flush=True)

# correctness spot-check on chip: certified vs oracle on a 100k slice
Ns = 100_000
crs = CertifiedRetriever(feats[:Ns], norms[:Ns], RetrievalConfig())
s, i = crs(dq[:256], K, excl[:256])
rs, ri = exact_topk_chunked(dq[:256], jnp.asarray(feats[:Ns]), jnp.asarray(norms[:Ns]), k=K)
print("on-chip exact-match:", int((np.asarray(i) == np.asarray(ri)).all(axis=1).sum()), "/256",
      "fallbacks:", crs.fallbacks, flush=True)

"""Round-3: v2 vs v3 certified tier, end-to-end, 10M items on real TPU.

python experiments/certified_r3.py [N] [B]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.ops.pallas.fused_topk import CertifiedRetriever


def chain_time(fr, q, k, excl, iters=8, reps=3, warmup=2):
    def chain(n):
        t0 = time.perf_counter()
        cur = q
        for _ in range(n):
            s, r = fr(cur, k, excl)
            cur = q + 0.0 * s[0, 0]
        float(s[0, 0])
        return (time.perf_counter() - t0) / n

    chain(warmup)
    return min(chain(iters) for _ in range(reps))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    rng = np.random.default_rng(0)
    feats = rng.random((n, 12), dtype=np.float32)
    norms = np.linalg.norm(feats, axis=1).astype(np.float32)
    q_rows = rng.integers(0, n, size=b)
    queries = jax.device_put(feats[q_rows])
    excl = jax.device_put(q_rows.astype(np.int32))
    k = 10

    for scan, depth in [("v3", 2), ("v3", 3), ("v2", 3)]:
        cfg = RetrievalConfig(scan=scan, scan_depth=depth)
        fr = CertifiedRetriever(feats, norms, cfg, sync_check=False)
        t = chain_time(fr, queries, k, excl)
        over = fr.verify_no_overflow()
        fb = fr.fallbacks
        t1 = chain_time(fr, queries[:1], k, excl[:1])
        print(
            f"{scan} d{depth}: B={b} {t*1e3:8.2f} ms  {b/t:9.0f} qps  "
            f"fallbacks={fb} overflow={over}   B=1 {t1*1e3:7.2f} ms",
            flush=True,
        )
        del fr


if __name__ == "__main__":
    main()

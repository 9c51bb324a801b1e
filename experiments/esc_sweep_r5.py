"""Round-5: depth-2 scan + in-jit depth-escalation vs the depth-3 prod scan.

The round-4 sweep (docs/PERFORMANCE.md) measured depth-2 W=128 scanning
~30% faster than depth-3 but leaning on 6-17 certificate fallbacks per
1024-query batch — each an oracle (cap, N) GEMM, and past `fallback_cap`
a host-path cliff.  Round 5's escalation instead rescans the <= 32
failing queries at a deeper bin depth in-jit (one extra catalog stream
for a tiny batch) and only oracles what still fails.

Run: python experiments/esc_sweep_r5.py [N] [B]
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


def chain(fn, q, iters=8, reps=3, warmup=2):
    def run(n):
        t0 = time.perf_counter()
        cur = q
        for _ in range(n):
            out = fn(cur)
            s0 = out[0] if isinstance(out, (tuple, list)) else out
            cur = q + (0.0 * s0[0, 0]).astype(q.dtype)
        float(s0[0, 0])
        return (time.perf_counter() - t0) / n

    run(warmup)
    return min(run(iters) for _ in range(reps))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    f, k = 12, 10
    rng = np.random.default_rng(0)
    feats = rng.random((n, f), dtype=np.float32)
    norms = np.linalg.norm(feats, axis=1).astype(np.float32)
    q_rows = rng.integers(0, n, size=b)
    queries = jax.device_put(jnp.asarray(feats[q_rows]))
    excl = np.asarray(q_rows, np.int32)

    configs = [
        ("d3 esc0 (r4 prod)", dict(scan_depth=3, scan_escalate=0)),
        ("d2 esc0", dict(scan_depth=2, scan_escalate=0)),
        ("d2 esc3", dict(scan_depth=2, scan_escalate=3)),
        ("d2 esc4", dict(scan_depth=2, scan_escalate=4)),
        ("d2W256 esc3", dict(scan_depth=2, scan_bins=256, scan_escalate=3)),
    ]
    if len(sys.argv) > 3:       # e.g. "0,2" = subset by index
        keep = {int(x) for x in sys.argv[3].split(",")}
        configs = [c for j, c in enumerate(configs) if j in keep]
    for name, kw in configs:
        cfg = RetrievalConfig(**kw)
        cr = CertifiedRetriever(feats, norms, cfg, sync_check=False)
        fn = lambda c: cr(c, k, exclude_rows=excl)
        dt = chain(fn, queries)
        bad = cr.verify_no_overflow()
        print(
            f"{name:18s} e2e {dt*1e3:8.2f} ms  qps {b/dt:10.0f}  "
            f"fallbacks {cr.fallbacks:4d}  esc {cr.escalations:4d}  "
            f"overflow_batches {bad}"
        )
        del cr


if __name__ == "__main__":
    main()

"""Round-4: decompose B=1 latency at 10M items (4-plane vs 2-plane).

Recorded r03 B=1 latency was 20.0 ms against a ~1.2 ms HBM floor
(4-plane) / ~0.6 ms (2-plane).  This times the scan kernel alone vs the
full certified path at B=1 across plane layouts and catalog tiles to
find where the other ~18 ms live.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/b1_sweep_r4.py [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.ops.pallas.fused_topk import (
    CertifiedRetriever, _round_up, _scan_call_v3,
)


def chain(fn, q, iters=16, reps=3, warmup=2):
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
    f, k = 12, 10
    rng = np.random.default_rng(0)
    feats = rng.random((n, f), dtype=np.float32)
    norms = np.linalg.norm(feats, axis=1).astype(np.float32)
    q_rows = rng.integers(0, n, size=8)
    queries = jnp.asarray(feats[q_rows])
    excl = jnp.asarray(q_rows.astype(np.int32))

    for planes in (4, 2):
        cfg = RetrievalConfig(split_planes=planes)
        fr = CertifiedRetriever(feats, norms, cfg, sync_check=False)
        print(f"planes={planes} tc_small={fr.tc_small} w={fr.w} "
              f"depth={fr._depth}", flush=True)
        # scan alone at bb=8 (the B=1 bucket)
        qn = jnp.linalg.norm(queries[:1], axis=1, keepdims=True)
        qu = queries[:1] / jnp.maximum(qn, 1e-30)
        qu8 = jnp.zeros((8, f), jnp.float32).at[:1].set(qu)
        qh = qu8.astype(jnp.bfloat16)
        ql = (qu8 - qh.astype(jnp.float32)).astype(jnp.bfloat16)
        q2 = jnp.concatenate([qh, ql, ql, qh], axis=1)
        for tc in (fr.tc_small, 131072, 262144):
            if _round_up(n, tc) != fr.features_t2.shape[1]:
                continue
            t_scan = chain(
                lambda c, tc=tc: _scan_call_v3(
                    c, fr.features_t2, tq=8, tc=tc, w=fr.w,
                    depth=fr._depth, topc=32,
                ),
                q2,
            )
            print(f"  scan tc={tc:6d}: {t_scan*1e3:7.2f} ms", flush=True)
        t_e2e = chain(lambda c: fr(c, k, excl[:1]), queries[:1])
        print(f"  e2e B=1: {t_e2e*1e3:7.2f} ms", flush=True)
        t_e2e8 = chain(lambda c: fr(c, k, excl), queries)
        print(f"  e2e B=8: {t_e2e8*1e3:7.2f} ms", flush=True)
        del fr


if __name__ == "__main__":
    main()

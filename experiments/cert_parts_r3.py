"""Round-3: decompose certified v3 time at 10M/B=1024 into scan / rerank /
fallback-branch / glue.  python experiments/cert_parts_r3.py [N] [B]"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.ops.pallas.fused_topk import (
    CertifiedRetriever, _certified_retrieve, _round_up, _scan_call_v3,
)


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
    rng = np.random.default_rng(0)
    feats = rng.random((n, 12), dtype=np.float32)
    norms = np.linalg.norm(feats, axis=1).astype(np.float32)
    q_rows = rng.integers(0, n, size=b)
    queries = jax.device_put(jnp.asarray(feats[q_rows]))
    excl = jax.device_put(jnp.asarray(q_rows.astype(np.int32)))
    k = 10

    cfg = RetrievalConfig(scan="v3", scan_depth=2)
    cr = CertifiedRetriever(feats, norms, cfg, sync_check=False)
    tq, tc, w = 256, cr.tc, cr.w
    print(f"tc={tc} w={w} depth={cr._depth}", flush=True)

    # prebuilt split-plane queries for the bare scan
    qn = jnp.linalg.norm(queries, axis=1, keepdims=True)
    qu = queries / jnp.maximum(qn, 1e-30)
    qh = qu.astype(jnp.bfloat16)
    ql = (qu - qh.astype(jnp.float32)).astype(jnp.bfloat16)
    q2 = jnp.concatenate([qh, ql, ql, qh], axis=1)

    t = chain(lambda c: _scan_call_v3(
        c, cr.features_t2, tq=tq, tc=tc, w=w, depth=2, topc=32), q2)
    print(f"scan_v3 alone      {t*1e3:8.2f} ms", flush=True)

    def full(c, cap):
        return _certified_retrieve(
            c, cr.features_t2, cr.norms_row, cr.features32, cr.norms1d,
            excl, cr._valid, jnp.int32(b),
            k=k, c=32, tq=tq, tc=tc, w=w, eps=1e-8, ceps=cr._ceps,
            fallback_cap=cap, bitexact_rerank=True,
            scan="v3", depth=2,
        )

    t = chain(lambda c: full(c, 0), queries)
    print(f"certified cap=0    {t*1e3:8.2f} ms", flush=True)
    t = chain(lambda c: full(c, 12), queries)
    print(f"certified cap=12   {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

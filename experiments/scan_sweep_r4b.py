"""Round-4b: small-W v3 configs (register pressure beats op count).

First sweep (scan_sweep_r4.py) showed W=256 at depth 2 scans in 60% of
the production W=1024 time — spills, not VPU ops, dominate.  This sweep
covers the small-W frontier at depth 2/3 and the fallback-branch cost
(cap), at both 10M and 1M (headline) scales.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/scan_sweep_r4b.py [N] [B]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spotify_recommender_tpu.ops.pallas.fused_topk import (
    _certified_retrieve, _round_up, _scan_call_v3,
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
    f, k = 12, 10
    rng = np.random.default_rng(0)
    feats = rng.random((n, f), dtype=np.float32)
    norms = np.linalg.norm(feats, axis=1).astype(np.float32)
    q_rows = rng.integers(0, n, size=b)
    queries = jax.device_put(jnp.asarray(feats[q_rows]))
    excl = jax.device_put(jnp.asarray(q_rows.astype(np.int32)))

    tc = 8192
    np_pad = _round_up(n, tc)
    unit = feats / np.maximum(norms, 1e-30)[:, None]
    hi = unit.astype(np.dtype(jnp.bfloat16))
    lo = (unit - hi.astype(np.float32)).astype(np.dtype(jnp.bfloat16))
    ft = np.zeros((4 * f, np_pad), np.float32)
    ft[:f, :n] = hi.astype(np.float32).T
    ft[f:2 * f, :n] = lo.astype(np.float32).T
    ft[2 * f:3 * f, :n] = hi.astype(np.float32).T
    ft[3 * f:, :n] = lo.astype(np.float32).T
    features_t2 = jax.device_put(jnp.asarray(ft, jnp.bfloat16))
    nrm = np.zeros((1, np_pad), np.float32)
    nrm[0, :n] = norms
    norms_row = jax.device_put(jnp.asarray(nrm))
    pad512 = (-n) % 512
    feats_p = np.concatenate([feats, np.zeros((pad512, f), np.float32)])
    norms_p = np.concatenate([norms, np.zeros(pad512, np.float32)])
    features32 = jax.device_put(jnp.asarray(feats_p))
    norms1d = jax.device_put(jnp.asarray(norms_p))
    valid = jnp.full((1, 1), n, jnp.int32)
    rn_min = jnp.float32(float(norms[norms > 0].min()))

    qn = jnp.linalg.norm(queries, axis=1, keepdims=True)
    qu = queries / jnp.maximum(qn, 1e-30)
    qh = qu.astype(jnp.bfloat16)
    ql = (qu - qh.astype(jnp.float32)).astype(jnp.bfloat16)
    q2 = jnp.concatenate([qh, ql, ql, qh], axis=1)

    combos = [
        # (depth, w, cap)
        (2, 256, 12),
        (2, 256, 8),
        (3, 256, 12),
        (2, 128, 12),
        (3, 128, 12),
        (4, 256, 12),
        (2, 1024, 12),   # production r3, for reference at this N
    ]
    tq = 256
    print(f"N={n} B={b} tq={tq} tc={tc}", flush=True)
    for depth, w, cap in combos:
        t_scan = chain(
            lambda c, w=w, d=depth: _scan_call_v3(
                c, features_t2, tq=tq, tc=tc, w=w, depth=d, topc=32
            ),
            q2,
        )
        t_full = chain(
            lambda c, w=w, d=depth, cap=cap: _certified_retrieve(
                c, features_t2, norms_row, features32, norms1d,
                excl, valid, jnp.int32(b), rn_min,
                k=k, c=32, tq=tq, tc=tc, w=w, eps=1e-8, ceps=2e-5,
                fallback_cap=cap, bitexact_rerank=True,
                scan="v3", depth=d,
            ),
            queries,
        )
        _, _, ok, _ = _certified_retrieve(
            queries, features_t2, norms_row, features32, norms1d,
            excl, valid, jnp.int32(b), rn_min,
            k=k, c=32, tq=tq, tc=tc, w=w, eps=1e-8, ceps=2e-5,
            fallback_cap=0, bitexact_rerank=True, scan="v3", depth=depth,
        )
        nfail = int(jnp.sum(~ok))
        print(
            f"d={depth} W={w:4d} cap={cap:2d}  "
            f"scan {t_scan*1e3:7.2f} ms  e2e {t_full*1e3:7.2f} ms  "
            f"qps {b/t_full:8.0f}  fallbacks {nfail}",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Round-4: sweep the v3 scan's (depth, W, tq, tc) at 10M/B=1024.

Round-3 data (experiments/kernel_r3.py, recorded in docs/PERFORMANCE.md):
the production depth-2 W=1024 scan costs +29.5 ms over the 16.6 ms MXU
floor while depth-1 W=512 costs only +7 ms — far beyond the 11-vs-6
VPU-op ratio, pointing at vreg spilling from the W=1024 (nw=8) bin
structure (40+ live vregs).  This sweep times the certified path
end-to-end (fallback_cap=12, the production setting) across the
register-pressure/coverage trade-off.

Run: python experiments/scan_sweep_r4.py [N] [B]
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
    f = 12
    k = 10
    rng = np.random.default_rng(0)
    feats = rng.random((n, f), dtype=np.float32)
    norms = np.linalg.norm(feats, axis=1).astype(np.float32)
    q_rows = rng.integers(0, n, size=b)
    queries = jax.device_put(jnp.asarray(feats[q_rows]))
    excl = jax.device_put(jnp.asarray(q_rows.astype(np.int32)))

    # build the 4-plane layout once at the largest pad
    tc_max = 16384
    np_pad = _round_up(n, tc_max)
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
        # (depth, w, tq, tc)
        (2, 1024, 256, 8192),   # production r3 default
        (2, 512, 256, 8192),
        (2, 256, 256, 8192),
        (2, 512, 128, 8192),
        (2, 512, 256, 16384),
        (2, 512, 512, 8192),
        (3, 512, 256, 8192),
        (1, 1024, 256, 8192),
    ]
    print(f"N={n} B={b} (scan alone | certified cap=12 e2e)", flush=True)
    for depth, w, tq, tc in combos:
        if (tc // 128) % (w // 128):
            continue
        t_scan = chain(
            lambda c, tq=tq, tc=tc, w=w, d=depth: _scan_call_v3(
                c, features_t2, tq=tq, tc=tc, w=w, depth=d, topc=32
            ),
            q2,
        )
        t_full = chain(
            lambda c, tq=tq, tc=tc, w=w, d=depth: _certified_retrieve(
                c, features_t2, norms_row, features32, norms1d,
                excl, valid, jnp.int32(b), rn_min,
                k=k, c=32, tq=tq, tc=tc, w=w, eps=1e-8, ceps=2e-5,
                fallback_cap=12, bitexact_rerank=True,
                scan="v3", depth=d,
            ),
            queries,
        )
        # fallback count at this config (coverage-failure rate check)
        _, _, ok, _ = _certified_retrieve(
            queries, features_t2, norms_row, features32, norms1d,
            excl, valid, jnp.int32(b), rn_min,
            k=k, c=32, tq=tq, tc=tc, w=w, eps=1e-8, ceps=2e-5,
            fallback_cap=0, bitexact_rerank=True, scan="v3", depth=depth,
        )
        nfail = int(jnp.sum(~ok))
        print(
            f"d={depth} W={w:4d} tq={tq:3d} tc={tc:5d}  "
            f"scan {t_scan*1e3:7.2f} ms  e2e {t_full*1e3:7.2f} ms  "
            f"qps {b/t_full:8.0f}  fallbacks {nfail}",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Round-5 roofline accounting for the certified retrieval path.

BASELINE.md's north star asks for >= 90% of HBM roofline on fused
score+top-k at 10M items.  This script measures, on the actual chip:

1. an achievable-bandwidth probe (pure read-reduce over the exact
   4-plane catalog buffer — the realistic ceiling for any kernel that
   must stream the catalog);
2. the v3 scan kernel alone (no rerank/certificate) per regime;
3. the certified end-to-end per regime;

and prints a roofline table: effective stream GB/s, % of the probe,
and the binding resource.  Bytes accounting: the catalog is streamed
once per QUERY TILE (grid = (B/tq) x (N/tc)), so large batches stream
it B/tq times — per-QUERY bytes shrink with batch, which is why the
batched regime is VPU-bound (bin-structure updates) while B=1 is
dispatch+stream-bound.

Run AFTER the bench (one chip — contention skews everything):
  python experiments/roofline_r5.py [N] [B]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.ops.pallas.fused_topk import (
    CertifiedRetriever, _round_up, _scan_call_v3,
)


def chain(fn, seed_arr, iters=6, reps=3, warmup=2):
    def run(m):
        t0 = time.perf_counter()
        cur = seed_arr
        for _ in range(m):
            out = fn(cur)
            s0 = out[0] if isinstance(out, (tuple, list)) else out
            cur = seed_arr + (0.0 * s0.reshape(-1)[0]).astype(seed_arr.dtype)
        float(s0.reshape(-1)[0])
        return (time.perf_counter() - t0) / m

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

    cfg = RetrievalConfig()
    cr = CertifiedRetriever(feats, norms, cfg, sync_check=False)
    planes = cr.features_t2.shape[0] // f
    cat_bytes = int(np.prod(cr.features_t2.shape)) * 2      # bf16

    # 1) achievable-bandwidth probe: pure read-reduce of the SAME buffer
    # (native-dtype max — no fp32 copy; one streaming pass).  Only
    # meaningful when the pass takes >> the ~3-7 ms tunnel dispatch
    # floor, i.e. at 10M items, not 1M.
    probe = jax.jit(lambda x: jnp.max(x))
    dt_probe = chain(lambda _c: probe(cr.features_t2), queries)
    bw_probe = cat_bytes / dt_probe / 1e9
    print(
        f"stream probe: {dt_probe*1e3:7.2f} ms for {cat_bytes/1e6:.0f} MB "
        f"-> {bw_probe:6.1f} GB/s achievable"
    )

    # 2) scan kernel alone (batched regime)
    tq = min(cfg.query_tile, _round_up(b, 8))
    qn = np.linalg.norm(np.asarray(queries), axis=1, keepdims=True)
    qu = np.asarray(queries) / np.maximum(qn, 1e-30)
    qh = qu.astype(np.dtype(jnp.bfloat16))
    ql = (qu - qh.astype(np.float32)).astype(np.dtype(jnp.bfloat16))
    q2 = jax.device_put(jnp.asarray(
        np.concatenate([qh, ql, ql, qh], axis=1), jnp.bfloat16
    ))
    scan = lambda c: _scan_call_v3(
        c, cr.features_t2, tq=tq, tc=cr.tc, w=cr.w,
        depth=cfg.scan_depth, topc=32,
    )
    dt_scan = chain(scan, q2)
    tiles = -(-b // tq)
    eff_scan = cat_bytes * tiles / dt_scan / 1e9
    print(
        f"scan alone (B={b}, {planes}-plane, {tiles} query tiles): "
        f"{dt_scan*1e3:7.2f} ms -> {eff_scan:6.1f} GB/s streamed "
        f"({100*eff_scan/bw_probe:.0f}% of probe)"
    )

    # 3) certified end-to-end
    dt_cert = chain(lambda c: cr(c, k, exclude_rows=excl), queries)
    eff_cert = cat_bytes * tiles / dt_cert / 1e9
    cr.verify_no_overflow()
    print(
        f"certified e2e (B={b}): {dt_cert*1e3:7.2f} ms "
        f"({b/dt_cert:9.0f} qps) -> {eff_cert:6.1f} GB/s "
        f"({100*eff_cert/bw_probe:.0f}% of probe), "
        f"fallbacks={cr.fallbacks} esc={cr.escalations}"
    )

    # 4) B=1 latency regime (2-plane small layout where present)
    q1 = jax.device_put(queries[:1])
    dt_b1 = chain(lambda c: cr(c, k, exclude_rows=excl[:1]), q1)
    small = cr.features_t2_small is not None
    b1_bytes = (cat_bytes // 2) if small else cat_bytes
    eff_b1 = b1_bytes / dt_b1 / 1e9
    print(
        f"certified B=1 ({'2' if small else str(planes)}-plane): "
        f"{dt_b1*1e3:7.2f} ms -> {eff_b1:6.1f} GB/s "
        f"({100*eff_b1/bw_probe:.0f}% of probe)"
    )


if __name__ == "__main__":
    main()

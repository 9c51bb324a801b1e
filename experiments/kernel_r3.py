"""Round-3 kernel ablation: where does 10M/B=1024 time go, and what do
leaner scan structures + grid inversion buy?

Variants timed (all bf16 split-plane catalogs, N=10M, F=12):
  mxu_only      dots + epilogue-free max-reduce (compute floor probe)
  scan_d3       current production depth-3 scan (query-outer grid)
  scan_d1       depth-1 bins + 2nd-best bound (5 VPU ops/group)
  scan_d1_inv   depth-1 with INVERTED grid (catalog outer, queries inner)
Run on the real TPU:  python experiments/kernel_r3.py [N] [B]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = np.float32(-np.inf)


def _round_up(x, m):
    return -(-x // m) * m


def bench(fn, q, iters=10, warmup=2, reps=3):
    """Chained timing: each call's query input depends on the previous
    call's first output scalar, fenced by a host readback — the only
    honest timing on tunneled backends (see benchmark.py chain())."""

    def chain(n):
        t0 = time.perf_counter()
        cur = q
        for _ in range(n):
            out = fn(cur)
            s0 = out[0] if isinstance(out, (tuple, list)) else out
            cur = q + (0.0 * s0[0, 0]).astype(q.dtype)
        float(s0[0, 0])
        return (time.perf_counter() - t0) / n

    chain(warmup)
    return min(chain(iters) for _ in range(reps))


# --------------------------------------------------------------------------
# mxu_only: dots + single per-lane max (1 VPU op/group) — the compute floor
# --------------------------------------------------------------------------
def _mxu_kernel(q_ref, f_ref, o_ref, acc, *, tc):
    cj = pl.program_id(1)
    tq = q_ref.shape[0]

    @pl.when(cj == 0)
    def _():
        acc[:] = jnp.full(acc.shape, NEG_INF, jnp.float32)

    dots = jax.lax.dot_general(
        q_ref[:], f_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    g = tc // 128
    m = acc[:]
    for gi in range(g):
        m = jnp.maximum(m, jax.lax.slice(dots, (0, gi * 128), (tq, (gi + 1) * 128)))
    acc[:] = m

    @pl.when(cj == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc[:]


@functools.partial(jax.jit, static_argnames=("tq", "tc"))
def mxu_only(q, ft, *, tq, tc):
    bp, qw = q.shape
    np_ = ft.shape[1]
    return pl.pallas_call(
        functools.partial(_mxu_kernel, tc=tc),
        grid=(bp // tq, np_ // tc),
        in_specs=[
            pl.BlockSpec((tq, qw), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((ft.shape[0], tc), lambda qi, cj: (0, cj)),
        ],
        out_specs=pl.BlockSpec((tq, 128), lambda qi, cj: (qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tq, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(q, ft)


# --------------------------------------------------------------------------
# scan_d1: depth-1 bins + 2nd-best bound, query-outer grid
# --------------------------------------------------------------------------
def _d1_kernel(q_ref, f_ref, ov_ref, oi_ref, ob_ref, *, tc, w):
    cj = pl.program_id(1)
    tq = q_ref.shape[0]
    nw = w // 128
    g = tc // 128

    @pl.when(cj == 0)
    def _():
        ov_ref[:] = jnp.full(ov_ref.shape, NEG_INF, jnp.float32)
        oi_ref[:] = jnp.full(oi_ref.shape, -1, jnp.int32)
        ob_ref[:] = jnp.full(ob_ref.shape, NEG_INF, jnp.float32)

    dots = jax.lax.dot_general(
        q_ref[:], f_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    v1 = [ov_ref[:, ww * 128:(ww + 1) * 128] for ww in range(nw)]
    i1 = [oi_ref[:, ww * 128:(ww + 1) * 128] for ww in range(nw)]
    v2 = [ob_ref[:, ww * 128:(ww + 1) * 128] for ww in range(nw)]
    for gi in range(g):
        ww = gi % nw
        s = jax.lax.slice(dots, (0, gi * 128), (tq, (gi + 1) * 128))
        idx = cj * tc + gi * 128 + lane
        c1 = s > v1[ww]
        v2[ww] = jnp.maximum(v2[ww], jnp.minimum(s, v1[ww]))
        i1[ww] = jnp.where(c1, idx, i1[ww])
        v1[ww] = jnp.where(c1, s, v1[ww])
    for ww in range(nw):
        ov_ref[:, ww * 128:(ww + 1) * 128] = v1[ww]
        oi_ref[:, ww * 128:(ww + 1) * 128] = i1[ww]
        ob_ref[:, ww * 128:(ww + 1) * 128] = v2[ww]


@functools.partial(jax.jit, static_argnames=("tq", "tc", "w", "invert"))
def scan_d1(q, ft, *, tq, tc, w, invert=False):
    bp, qw = q.shape
    np_ = ft.shape[1]
    if invert:
        grid = (np_ // tc, bp // tq)
        qmap = lambda cj, qi: (qi, 0)
        fmap = lambda cj, qi: (0, cj)
        omap = lambda cj, qi: (qi, 0)
    else:
        grid = (bp // tq, np_ // tc)
        qmap = lambda qi, cj: (qi, 0)
        fmap = lambda qi, cj: (0, cj)
        omap = lambda qi, cj: (qi, 0)

    def kern(q_ref, f_ref, ov, oi, ob):
        # program_id position of the catalog axis differs per layout
        cj = pl.program_id(0) if invert else pl.program_id(1)
        tq_ = q_ref.shape[0]
        nw = w // 128
        g = tc // 128
        first = (pl.program_id(0) == 0) if invert else (cj == 0)

        @pl.when(first)
        def _():
            ov[:] = jnp.full(ov.shape, NEG_INF, jnp.float32)
            oi[:] = jnp.full(oi.shape, -1, jnp.int32)
            ob[:] = jnp.full(ob.shape, NEG_INF, jnp.float32)

        dots = jax.lax.dot_general(
            q_ref[:], f_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (tq_, 128), 1)
        v1 = [ov[:, ww * 128:(ww + 1) * 128] for ww in range(nw)]
        i1 = [oi[:, ww * 128:(ww + 1) * 128] for ww in range(nw)]
        v2 = [ob[:, ww * 128:(ww + 1) * 128] for ww in range(nw)]
        for gi in range(g):
            ww = gi % nw
            s = jax.lax.slice(dots, (0, gi * 128), (tq_, (gi + 1) * 128))
            idx = cj * tc + gi * 128 + lane
            c1 = s > v1[ww]
            v2[ww] = jnp.maximum(v2[ww], jnp.minimum(s, v1[ww]))
            i1[ww] = jnp.where(c1, idx, i1[ww])
            v1[ww] = jnp.where(c1, s, v1[ww])
        for ww in range(nw):
            ov[:, ww * 128:(ww + 1) * 128] = v1[ww]
            oi[:, ww * 128:(ww + 1) * 128] = i1[ww]
            ob[:, ww * 128:(ww + 1) * 128] = v2[ww]

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, qw), qmap),
            pl.BlockSpec((ft.shape[0], tc), fmap),
        ],
        out_specs=[
            pl.BlockSpec((tq, w), omap),
            pl.BlockSpec((tq, w), omap),
            pl.BlockSpec((tq, w), omap),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, w), jnp.float32),
            jax.ShapeDtypeStruct((bp, w), jnp.int32),
            jax.ShapeDtypeStruct((bp, w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(q, ft)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    f = 12
    tq = 256
    tc = 8192
    w = 512
    rng = np.random.default_rng(0)
    np_pad = _round_up(n, max(tc, 65536))
    # 4-plane bf16 catalog (prod layout at F=12)
    ft = rng.standard_normal((4 * f, np_pad), dtype=np.float32)
    ft = jax.device_put(jnp.asarray(ft, jnp.bfloat16))
    q = rng.standard_normal((b, 4 * f), dtype=np.float32)
    q = jax.device_put(jnp.asarray(q, jnp.bfloat16))
    bytes_cat = np_pad * 4 * f * 2

    from spotify_recommender_tpu.ops.pallas.fused_topk import _scan_call

    qn = jnp.ones((b, 1), jnp.float32)
    nr = jax.device_put(jnp.ones((1, np_pad), jnp.float32))
    ex = jnp.full((b, 1), -1, jnp.int32)
    valid = jnp.full((1, 1), n, jnp.int32)

    def run_d3(qq):
        return _scan_call(qq, qn, ft, nr, ex, valid, tq=tq, tc=tc, w=w,
                          eps=1e-8, topc=32)

    variants = {
        "mxu_only": lambda qq: mxu_only(qq, ft, tq=tq, tc=tc),
        "scan_d3_topc": run_d3,
        "scan_d1": lambda qq: scan_d1(qq, ft, tq=tq, tc=tc, w=w),
        "scan_d1_inv": lambda qq: scan_d1(qq, ft, tq=tq, tc=tc, w=w,
                                          invert=True),
    }
    for name, fn in variants.items():
        t = bench(fn, q)
        qps = b / t
        gbps = bytes_cat / t / 1e9
        print(f"{name:16s} {t*1e3:9.3f} ms  {qps:12.0f} qps  "
              f"{gbps:8.1f} GB/s(actual-bytes)", flush=True)


if __name__ == "__main__":
    main()

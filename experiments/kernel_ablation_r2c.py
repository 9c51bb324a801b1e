"""Round-2 ablation, part C: grid-step overhead (tile sizes), parallel
dimension semantics, bf16x2 split-catalog dot, staged-epilogue test.

Usage: python experiments/kernel_ablation_r2c.py
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


def _dot(q_ref, f_ref):
    is_bf16 = f_ref.dtype == jnp.bfloat16
    return jax.lax.dot_general(
        q_ref[:], f_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.DEFAULT if is_bf16
                   else jax.lax.Precision.HIGHEST),
    )


def k_dotonly(q_ref, qn_ref, f_ref, cn_ref, out_s_ref, r_s, *, tc):
    dots = _dot(q_ref, f_ref)
    r_s[:] = jax.lax.slice(dots, (0, 0), (r_s.shape[0], r_s.shape[1]))
    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        out_s_ref[:] = r_s[:]


def k_fastguard(q_ref, qn_ref, f_ref, cn_ref, out_s_ref, r_s, *, tc):
    """bf16 tier: dot + guard + clip + pad mask + wide max."""
    cj = pl.program_id(1)
    dots = _dot(q_ref, f_ref)
    denom = qn_ref[:] * cn_ref[:]
    scores = jnp.where(denom > jnp.float32(1e-8),
                       jnp.clip(dots, -1.0, 1.0), jnp.float32(0.0))
    m0 = jnp.max(scores, axis=1)
    r_s[:] = jnp.broadcast_to(m0[:, None], r_s.shape)
    @pl.when(cj == pl.num_programs(1) - 1)
    def _():
        out_s_ref[:] = r_s[:]


def k_fastguard_top2(q_ref, qn_ref, f_ref, cn_ref, out_s_ref, r_s, *, tc):
    """bf16 tier + per-lane vertical top-2 scan (the v2 merge front-end)."""
    cj = pl.program_id(1)
    dots = _dot(q_ref, f_ref)
    denom = qn_ref[:] * cn_ref[:]
    scores = jnp.where(denom > jnp.float32(1e-8),
                       jnp.clip(dots, -1.0, 1.0), jnp.float32(0.0))
    g = tc // 128
    tq = scores.shape[0]
    v1 = jax.lax.slice(scores, (0, 0), (tq, 128))
    g1 = jnp.zeros((tq, 128), jnp.int32)
    v2 = jnp.full((tq, 128), NEG_INF, jnp.float32)
    g2 = jnp.zeros((tq, 128), jnp.int32)
    for gi in range(1, g):
        s = jax.lax.slice(scores, (0, gi * 128), (tq, (gi + 1) * 128))
        beat1 = s > v1
        beat2 = jnp.logical_and(jnp.logical_not(beat1), s > v2)
        v2 = jnp.where(beat1, v1, jnp.where(beat2, s, v2))
        g2 = jnp.where(beat1, g1, jnp.where(beat2, gi, g2))
        v1 = jnp.where(beat1, s, v1)
        g1 = jnp.where(beat1, gi, g1)
    m0 = jnp.max(v1, axis=1)
    r_s[:] = jnp.broadcast_to(m0[:, None], r_s.shape)
    r_s[:, 0] = r_s[:, 0] + jnp.max(g1 + g2, axis=1).astype(jnp.float32) * 0
    @pl.when(cj == pl.num_programs(1) - 1)
    def _():
        out_s_ref[:] = r_s[:]


def k_staged_f32(q_ref, qn_ref, f_ref, cn_ref, out_s_ref, r_s, s_scr, *, tc):
    """f32 HIGHEST dot staged to scratch, then epilogue from scratch —
    does decoupling MXU output from VPU epilogue fix the 7 ms anomaly?"""
    cj = pl.program_id(1)
    s_scr[:] = _dot(q_ref, f_ref)
    denom = qn_ref[:] * cn_ref[:]
    scores = jnp.where(denom > jnp.float32(1e-8),
                       jnp.clip(s_scr[:] / denom, -1.0, 1.0),
                       jnp.float32(0.0))
    m0 = jnp.max(scores, axis=1)
    r_s[:] = jnp.broadcast_to(m0[:, None], r_s.shape)
    @pl.when(cj == pl.num_programs(1) - 1)
    def _():
        out_s_ref[:] = r_s[:]


# name -> (kernel, dtype, tq, tc, F_stored, parallel_q, staged)
CASES = {
    "dot_f32_512x8k":    (k_dotonly, jnp.float32, 512, 8192, 12, False, False),
    "dot_f32_256x32k":   (k_dotonly, jnp.float32, 256, 32768, 12, False, False),
    "dot_f32_128x64k":   (k_dotonly, jnp.float32, 128, 65536, 12, False, False),
    "dot_f32_par":       (k_dotonly, jnp.float32, 512, 8192, 12, True, False),
    "dot_bf16x2_512x8k": (k_dotonly, jnp.bfloat16, 512, 8192, 24, False, False),
    "dot_bf16x2_256x32k": (k_dotonly, jnp.bfloat16, 256, 32768, 24, False, False),
    "fg_bf16x2_256x32k": (k_fastguard, jnp.bfloat16, 256, 32768, 24, False, False),
    "fg_bf16x2_512x8k":  (k_fastguard, jnp.bfloat16, 512, 8192, 24, False, False),
    "fg2_bf16x2_256x32k": (k_fastguard_top2, jnp.bfloat16, 256, 32768, 24, False, False),
    "fg2_bf16x2_512x8k": (k_fastguard_top2, jnp.bfloat16, 512, 8192, 24, False, False),
    "staged_f32_512x8k": (k_staged_f32, jnp.float32, 512, 8192, 12, False, True),
    "fg_f32_256x32k":    (k_fastguard, jnp.float32, 256, 32768, 12, False, False),
}


@functools.partial(jax.jit, static_argnames=("name",))
def run_case(queries_p, q_norms_p, features_t, norms_p, *, name):
    kernel_fn, _, tq, tc, _, par_q, staged = CASES[name]
    bp, f = queries_p.shape
    np_ = features_t.shape[1]
    grid = (bp // tq, np_ // tc)
    kernel = functools.partial(kernel_fn, tc=tc)
    scratch = [pltpu.VMEM((tq, 128), jnp.float32)]
    if staged:
        scratch.append(pltpu.VMEM((tq, tc), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, f), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((tq, 1), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((f, tc), lambda qi, cj: (0, cj)),
            pl.BlockSpec((1, tc), lambda qi, cj: (0, cj)),
        ],
        out_specs=[pl.BlockSpec((tq, 128), lambda qi, cj: (qi, 0))],
        out_shape=[jax.ShapeDtypeStruct((bp, 128), jnp.float32)],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel" if par_q else "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(queries_p, q_norms_p, features_t, norms_p)


def main():
    names = sys.argv[1:] or list(CASES)
    B, N = 1024, 1_000_000
    rng = np.random.default_rng(0)
    feats = rng.random((N, 12), dtype=np.float32)
    norms = np.linalg.norm(feats, axis=1).astype(np.float32)
    unit = feats / norms[:, None]
    q = feats[rng.integers(0, N, B)]
    qn = np.linalg.norm(q, axis=1, keepdims=True).astype(np.float32)
    qunit = (q / qn).astype(np.float32)

    buf_cache = {}

    def buffers(name):
        _, dt, tq, tc, fs, _, _ = CASES[name]
        key = (dt, tc, fs)
        if key not in buf_cache:
            NP = -(-N // tc) * tc
            nrm = np.zeros((1, NP), np.float32)
            nrm[0, :N] = norms
            if fs == 24:
                hi = unit.astype(np.dtype("bfloat16") if False else np.float32)
                hi16 = jnp.asarray(unit, jnp.bfloat16)
                hi32 = np.asarray(hi16, np.float32)
                lo16 = jnp.asarray(unit - hi32, jnp.bfloat16)
                ft = np.zeros((24, NP), np.float32)
                ft[:12, :N] = np.asarray(hi16, np.float32).T
                ft[12:, :N] = np.asarray(lo16, np.float32).T
                dft = jax.device_put(jnp.asarray(ft, jnp.bfloat16))
                qh16 = jnp.asarray(qunit, jnp.bfloat16)
                qh32 = np.asarray(qh16, np.float32)
                ql16 = jnp.asarray(qunit - qh32, jnp.bfloat16)
                qp = np.zeros((B, 24), np.float32)
                qp[:, :12] = np.asarray(qh16, np.float32)
                qp[:, 12:] = np.asarray(ql16, np.float32)
                dq = jax.device_put(jnp.asarray(qp, jnp.bfloat16))
            else:
                ft = np.zeros((12, NP), np.float32)
                ft[:, :N] = feats.T
                dft = jax.device_put(jnp.asarray(ft, dt))
                dq = jax.device_put(jnp.asarray(q, dt))
            buf_cache[key] = (dq, jax.device_put(qn), dft,
                              jax.device_put(nrm))
        return buf_cache[key]

    def chain(name, n):
        dq, dqn, dft, dnrm = buffers(name)
        t0 = time.perf_counter()
        cur = dq
        for _ in range(n):
            (out_s,) = run_case(cur, dqn, dft, dnrm, name=name)
            cur = (dq + (0.0 * out_s[0, 0]).astype(dq.dtype))
        float(out_s[0, 0])
        return (time.perf_counter() - t0) / n

    for name in names:
        try:
            t0 = time.perf_counter()
            chain(name, 1)
            compile_s = time.perf_counter() - t0
            dt = chain(name, 20)
            print(f"{name:20s}  {dt*1e3:8.2f} ms/batch  ({B/dt:,.0f} qps)"
                  f"  compile {compile_s:.1f}s", flush=True)
        except Exception as e:
            print(f"{name:20s}  FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()

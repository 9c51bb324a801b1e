"""Round-2 ablation, part B: decompose the exact epilogue cost and measure
the bf16 fast-tier dot.  Run: python experiments/kernel_ablation_r2b.py
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


def _finish(scores, r_s, r_i, out_s_ref, out_i_ref):
    m0 = jnp.max(scores, axis=1)
    r_s[:] = jnp.broadcast_to(m0[:, None], r_s.shape)
    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        out_s_ref[:] = r_s[:]
        out_i_ref[:] = jnp.zeros(out_i_ref.shape, jnp.int32)


def k_e_div(q_ref, qn_ref, f_ref, cn_ref, excl_ref, valid_ref,
            out_s_ref, out_i_ref, r_s, r_i, *, tc):
    """denominator mul + raw div + clip (no guard selects, no masks)."""
    dots = _dot(q_ref, f_ref)
    denom = qn_ref[:] * cn_ref[:]
    scores = jnp.clip(dots / denom, -1.0, 1.0)
    _finish(scores, r_s, r_i, out_s_ref, out_i_ref)


def k_e_recip(q_ref, qn_ref, f_ref, cn_ref, excl_ref, valid_ref,
              out_s_ref, out_i_ref, r_s, r_i, *, tc):
    """reciprocal-mul epilogue: norms passed pre-inverted, so the scale is
    one broadcast multiply instead of a division."""
    dots = _dot(q_ref, f_ref)
    scores = jnp.clip(dots * (qn_ref[:] * cn_ref[:]), -1.0, 1.0)
    _finish(scores, r_s, r_i, out_s_ref, out_i_ref)


def k_e_guard(q_ref, qn_ref, f_ref, cn_ref, excl_ref, valid_ref,
              out_s_ref, out_i_ref, r_s, r_i, *, tc):
    """full exact epilogue: guard + safe-div + clip + pad/self masks."""
    cj = pl.program_id(1)
    dots = _dot(q_ref, f_ref)
    denom = qn_ref[:] * cn_ref[:]
    guard = denom > jnp.float32(1e-8)
    safe = jnp.where(guard, denom, jnp.float32(1.0))
    scores = jnp.where(guard, jnp.clip(dots / safe, -1.0, 1.0),
                       jnp.float32(0.0))
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, scores.shape[1]), 1)
    gcol_row = cj * tc + lane_row
    bad = (gcol_row >= valid_ref[0, 0]) | (gcol_row == excl_ref[:])
    scores = jnp.where(bad, NEG_INF, scores)
    _finish(scores, r_s, r_i, out_s_ref, out_i_ref)


def k_e_fast(q_ref, qn_ref, f_ref, cn_ref, excl_ref, valid_ref,
             out_s_ref, out_i_ref, r_s, r_i, *, tc):
    """fast-mode epilogue: clip + pad/self masks only (pre-normalized)."""
    cj = pl.program_id(1)
    dots = _dot(q_ref, f_ref)
    scores = jnp.clip(dots, -1.0, 1.0)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, scores.shape[1]), 1)
    gcol_row = cj * tc + lane_row
    bad = (gcol_row >= valid_ref[0, 0]) | (gcol_row == excl_ref[:])
    scores = jnp.where(bad, NEG_INF, scores)
    _finish(scores, r_s, r_i, out_s_ref, out_i_ref)


def k_dotonly(q_ref, qn_ref, f_ref, cn_ref, excl_ref, valid_ref,
              out_s_ref, out_i_ref, r_s, r_i, *, tc):
    dots = _dot(q_ref, f_ref)
    r_s[:] = jax.lax.slice(dots, (0, 0), (r_s.shape[0], r_s.shape[1]))
    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        out_s_ref[:] = r_s[:]
        out_i_ref[:] = jnp.zeros(out_i_ref.shape, jnp.int32)


def k_e_fast_guard(q_ref, qn_ref, f_ref, cn_ref, excl_ref, valid_ref,
                   out_s_ref, out_i_ref, r_s, r_i, *, tc):
    """fast epilogue + zero-norm guard (needed for the certified tier)."""
    cj = pl.program_id(1)
    dots = _dot(q_ref, f_ref)
    denom = qn_ref[:] * cn_ref[:]
    scores = jnp.where(denom > jnp.float32(1e-8),
                       jnp.clip(dots, -1.0, 1.0), jnp.float32(0.0))
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, scores.shape[1]), 1)
    gcol_row = cj * tc + lane_row
    bad = (gcol_row >= valid_ref[0, 0]) | (gcol_row == excl_ref[:])
    scores = jnp.where(bad, NEG_INF, scores)
    _finish(scores, r_s, r_i, out_s_ref, out_i_ref)


KERNELS = {
    "dotonly_f32": (k_dotonly, jnp.float32),
    "dotonly_bf16": (k_dotonly, jnp.bfloat16),
    "e_div": (k_e_div, jnp.float32),
    "e_recip": (k_e_recip, jnp.float32),
    "e_guard": (k_e_guard, jnp.float32),
    "e_fast_f32": (k_e_fast, jnp.float32),
    "e_fast_bf16": (k_e_fast, jnp.bfloat16),
    "e_fastguard_bf16": (k_e_fast_guard, jnp.bfloat16),
}


@functools.partial(jax.jit, static_argnames=("name", "k", "tq", "tc"))
def run_variant(queries_p, q_norms_p, features_t, norms_p, excl_p, valid,
                *, name, k, tq, tc):
    bp, f = queries_p.shape
    np_ = features_t.shape[1]
    grid = (bp // tq, np_ // tc)
    kernel = functools.partial(KERNELS[name][0], tc=tc)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, f), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((tq, 1), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((f, tc), lambda qi, cj: (0, cj)),
            pl.BlockSpec((1, tc), lambda qi, cj: (0, cj)),
            pl.BlockSpec((tq, 1), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((1, 1), lambda qi, cj: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, k), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((tq, k), lambda qi, cj: (qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, k), jnp.float32),
            jax.ShapeDtypeStruct((bp, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, k), jnp.float32),
            pltpu.VMEM((tq, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(queries_p, q_norms_p, features_t, norms_p, excl_p, valid)


def main():
    variants = sys.argv[1:] or list(KERNELS)
    B, N, F, K, TQ, TC = 1024, 1_000_000, 12, 16, 512, 8192
    NP = -(-N // TC) * TC
    rng = np.random.default_rng(0)
    feats = rng.random((N, F), dtype=np.float32)
    norms = np.linalg.norm(feats, axis=1).astype(np.float32)
    ft32 = np.zeros((F, NP), np.float32)
    ft32[:, :N] = feats.T
    nrm = np.zeros((1, NP), np.float32)
    nrm[0, :N] = norms
    q = feats[rng.integers(0, N, B)]
    qn = np.linalg.norm(q, axis=1, keepdims=True).astype(np.float32)
    dq = jax.device_put(q)
    dqn = jax.device_put(qn)
    dft = {jnp.float32: jax.device_put(jnp.asarray(ft32)),
           jnp.bfloat16: jax.device_put(jnp.asarray(ft32, jnp.bfloat16))}
    dnrm = jax.device_put(nrm)
    dexcl = jax.device_put(np.full((B, 1), -1, np.int32))
    dvalid = jax.device_put(np.full((1, 1), N, np.int32))

    def chain(name, n):
        dt = KERNELS[name][1]
        t0 = time.perf_counter()
        cur = dq
        for _ in range(n):
            out_s, out_i = run_variant(
                cur.astype(dt) if dt == jnp.bfloat16 else cur,
                dqn, dft[dt], dnrm, dexcl, dvalid,
                name=name, k=K, tq=TQ, tc=TC)
            cur = dq + 0.0 * out_s[0, 0]
        float(out_s[0, 0])
        return (time.perf_counter() - t0) / n

    for name in variants:
        t0 = time.perf_counter()
        chain(name, 1)
        compile_s = time.perf_counter() - t0
        dt = chain(name, 20)
        print(f"{name:18s}  {dt*1e3:8.2f} ms/batch   "
              f"({B/dt:,.0f} qps)  compile {compile_s:.1f}s", flush=True)


if __name__ == "__main__":
    main()

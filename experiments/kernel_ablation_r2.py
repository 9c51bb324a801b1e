"""Round-2 kernel ablation: isolate the cost of each stage of the fused
score+top-k kernel on the real TPU chip.

Hypotheses under test (from docs/PERFORMANCE.md round-1 ablation):
  H1: `jnp.max(scores, axis=1)` over tc=8192 lanes is badly lowered; a
      manual two-stage reduce (vertical vreg max over tc//128 column
      groups, then one 128-lane cross-lane max) is ~10x cheaper.
  H2: the insert loop's full-tile staging + per-round full-tile argmax
      dominates; running the tournament on a reduced (TQ, 128) per-lane
      top-2 structure removes almost all per-round cost.

Usage: python experiments/kernel_ablation_r2.py [variant ...]
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
_BIG_I32 = np.int32(2**30)


# ---------------------------------------------------------------- kernels
def _score_tile(q_ref, qn_ref, f_ref, cn_ref, excl_ref, valid_ref, cj, tc,
                eps=1e-8, exact=True):
    dots = jax.lax.dot_general(
        q_ref[:], f_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if exact:
        denom = qn_ref[:] * cn_ref[:]
        guard = denom > jnp.float32(eps)
        safe = jnp.where(guard, denom, jnp.float32(1.0))
        scores = jnp.where(guard, jnp.clip(dots / safe, -1.0, 1.0),
                           jnp.float32(0.0))
    else:
        scores = jnp.clip(dots, -1.0, 1.0)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, scores.shape[1]), 1)
    gcol_row = cj * tc + lane_row
    bad = (gcol_row >= valid_ref[0, 0]) | (gcol_row == excl_ref[:])
    return jnp.where(bad, NEG_INF, scores)


def k_dotonly(q_ref, qn_ref, f_ref, cn_ref, excl_ref, valid_ref,
              out_s_ref, out_i_ref, r_s, r_i, s_scr, *, k, tc):
    cj = pl.program_id(1)
    dots = jax.lax.dot_general(
        q_ref[:], f_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    r_s[:] = jax.lax.slice(dots, (0, 0), (r_s.shape[0], k))
    @pl.when(cj == pl.num_programs(1) - 1)
    def _():
        out_s_ref[:] = r_s[:]
        out_i_ref[:] = jnp.zeros(out_i_ref.shape, jnp.int32)


def k_dot_widemax(q_ref, qn_ref, f_ref, cn_ref, excl_ref, valid_ref,
                  out_s_ref, out_i_ref, r_s, r_i, s_scr, *, k, tc):
    """dot + epilogue + single wide jnp.max (round-1 style)."""
    cj = pl.program_id(1)
    scores = _score_tile(q_ref, qn_ref, f_ref, cn_ref, excl_ref, valid_ref,
                         cj, tc)
    m0 = jnp.max(scores, axis=1)
    r_s[:, 0] = jnp.maximum(r_s[:, 0], m0) if False else m0  # keep live
    r_s[:] = jnp.broadcast_to(m0[:, None], r_s.shape)
    @pl.when(cj == pl.num_programs(1) - 1)
    def _():
        out_s_ref[:] = r_s[:]
        out_i_ref[:] = jnp.zeros(out_i_ref.shape, jnp.int32)


def k_dot_vertmax(q_ref, qn_ref, f_ref, cn_ref, excl_ref, valid_ref,
                  out_s_ref, out_i_ref, r_s, r_i, s_scr, *, k, tc):
    """dot + epilogue + two-stage max: vertical slice loop then 128-lane."""
    cj = pl.program_id(1)
    scores = _score_tile(q_ref, qn_ref, f_ref, cn_ref, excl_ref, valid_ref,
                         cj, tc)
    g = tc // 128
    vmax = jax.lax.slice(scores, (0, 0), (scores.shape[0], 128))
    for gi in range(1, g):
        vmax = jnp.maximum(
            vmax,
            jax.lax.slice(scores, (0, gi * 128),
                          (scores.shape[0], (gi + 1) * 128)))
    m0 = jnp.max(vmax, axis=1)
    r_s[:] = jnp.broadcast_to(m0[:, None], r_s.shape)
    @pl.when(cj == pl.num_programs(1) - 1)
    def _():
        out_s_ref[:] = r_s[:]
        out_i_ref[:] = jnp.zeros(out_i_ref.shape, jnp.int32)


def k_dot_verttop2(q_ref, qn_ref, f_ref, cn_ref, excl_ref, valid_ref,
                   out_s_ref, out_i_ref, r_s, r_i, s_scr, *, k, tc):
    """dot + epilogue + per-lane vertical top-2 with group tracking."""
    cj = pl.program_id(1)
    scores = _score_tile(q_ref, qn_ref, f_ref, cn_ref, excl_ref, valid_ref,
                         cj, tc)
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
    r_i[:] = jnp.broadcast_to(
        jnp.max(g1 + g2, axis=1)[:, None], r_i.shape)  # keep g1/g2 live
    @pl.when(cj == pl.num_programs(1) - 1)
    def _():
        out_s_ref[:] = r_s[:]
        out_i_ref[:] = r_i[:]


def k_full_r1(q_ref, qn_ref, f_ref, cn_ref, excl_ref, valid_ref,
              out_s_ref, out_i_ref, r_s, r_i, s_scr, *, k, tc):
    """The round-1 production kernel body (baseline)."""
    from spotify_recommender_tpu.ops.pallas.fused_topk import _fused_kernel
    _fused_kernel(q_ref, qn_ref, f_ref, cn_ref, excl_ref, valid_ref,
                  out_s_ref, out_i_ref, r_s, r_i, s_scr,
                  k=k, tc=tc, eps=1e-8, exact=True)


KERNELS = {
    "dotonly": k_dotonly,
    "widemax": k_dot_widemax,
    "vertmax": k_dot_vertmax,
    "verttop2": k_dot_verttop2,
    "full_r1": k_full_r1,
}


@functools.partial(jax.jit, static_argnames=("name", "k", "tq", "tc"))
def run_variant(queries_p, q_norms_p, features_t, norms_p, excl_p, valid,
                *, name, k, tq, tc):
    bp, f = queries_p.shape
    np_ = features_t.shape[1]
    grid = (bp // tq, np_ // tc)
    kernel = functools.partial(KERNELS[name], k=k, tc=tc)
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
            pltpu.VMEM((tq, tc), jnp.float32),
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
    ft = np.zeros((F, NP), np.float32)
    ft[:, :N] = feats.T
    nrm = np.zeros((1, NP), np.float32)
    nrm[0, :N] = norms
    q = feats[rng.integers(0, N, B)]
    qn = np.linalg.norm(q, axis=1, keepdims=True).astype(np.float32)
    dq = jax.device_put(q)
    dqn = jax.device_put(qn)
    dft = jax.device_put(ft)
    dnrm = jax.device_put(nrm)
    dexcl = jax.device_put(np.full((B, 1), -1, np.int32))
    dvalid = jax.device_put(np.full((1, 1), N, np.int32))

    def chain(name, n):
        """Chained-data-dependency timing with a host readback fence —
        block_until_ready on the tunneled backend can ack early."""
        t0 = time.perf_counter()
        cur = dq
        for _ in range(n):
            out_s, out_i = run_variant(cur, dqn, dft, dnrm, dexcl, dvalid,
                                       name=name, k=K, tq=TQ, tc=TC)
            cur = dq + 0.0 * out_s[0, 0]
        float(out_s[0, 0])
        return (time.perf_counter() - t0) / n

    for name in variants:
        t0 = time.perf_counter()
        chain(name, 1)
        compile_s = time.perf_counter() - t0
        dt = chain(name, 20)
        print(f"{name:12s}  {dt*1e3:8.2f} ms/batch   "
              f"({B/dt:,.0f} qps)  compile {compile_s:.1f}s", flush=True)


if __name__ == "__main__":
    main()

"""Part E: (1) exact-rerank cost vs candidate count, (2) depth-3/width-256
reduction-scan kernel front-end, (3) XLA top_k on candidate lists."""
from __future__ import annotations
import functools, sys, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = np.float32(-np.inf)
B, N, F = 1024, 1_000_000, 12

@functools.partial(jax.jit, static_argnames=("k",))
def rerank(queries, cand_idx, features, norms, k):
    cand = features[cand_idx]
    cand_n = norms[cand_idx]
    qn = jnp.linalg.norm(queries, axis=1)
    dots = jnp.einsum("bf,bcf->bc", queries, cand,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    denom = qn[:, None] * cand_n
    scores = jnp.where(denom > 1e-8,
                       jnp.clip(dots / jnp.where(denom > 1e-8, denom, 1.0), -1, 1), 0.0)
    top_s, pos = jax.lax.top_k(scores, k)
    return top_s, jnp.take_along_axis(cand_idx, pos, axis=1)

def k_scan3(q_ref, qn_ref, f_ref, cn_ref,
            ov1, oi1, ov2, oi2, ov3, oi3, ov4,
            v1, i1, v2, i2, v3, i3, v4, *, tc):
    """depth-3 (with indices) + v4 bound, width-256 running reduction."""
    cj = pl.program_id(1)
    tq = v1.shape[0]
    @pl.when(cj == 0)
    def _():
        for ref in (v1, v2, v3, v4):
            ref[:] = jnp.full(ref.shape, NEG_INF, jnp.float32)
        for ref in (i1, i2, i3):
            ref[:] = jnp.full(ref.shape, -1, jnp.int32)
    dots = jax.lax.dot_general(
        q_ref[:], f_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    denom = qn_ref[:] * cn_ref[:]
    scores = jnp.where(denom > jnp.float32(1e-8),
                       jnp.clip(dots, -1.0, 1.0), jnp.float32(0.0))
    g = tc // 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    for gi in range(g):
        w = (gi % 2) * 128
        s = jax.lax.slice(scores, (0, gi * 128), (tq, (gi + 1) * 128))
        idx = cj * tc + gi * 128 + lane
        V1 = v1[:, w:w+128]; V2 = v2[:, w:w+128]
        V3 = v3[:, w:w+128]; V4 = v4[:, w:w+128]
        b1 = s > V1
        b2 = jnp.logical_and(jnp.logical_not(b1), s > V2)
        b3 = jnp.logical_and(jnp.logical_not(b1 | b2), s > V3)
        b4 = jnp.logical_and(jnp.logical_not(b1 | b2 | b3), s > V4)
        v4[:, w:w+128] = jnp.where(b1 | b2 | b3, V3, jnp.where(b4, s, V4))
        v3[:, w:w+128] = jnp.where(b1 | b2, V2, jnp.where(b3, s, V3))
        i3[:, w:w+128] = jnp.where(b1 | b2, i2[:, w:w+128],
                                   jnp.where(b3, idx, i3[:, w:w+128]))
        v2[:, w:w+128] = jnp.where(b1, V1, jnp.where(b2, s, V2))
        i2[:, w:w+128] = jnp.where(b1, i1[:, w:w+128],
                                   jnp.where(b2, idx, i2[:, w:w+128]))
        v1[:, w:w+128] = jnp.where(b1, s, V1)
        i1[:, w:w+128] = jnp.where(b1, idx, i1[:, w:w+128])
    @pl.when(cj == pl.num_programs(1) - 1)
    def _():
        ov1[:] = v1[:]; oi1[:] = i1[:]
        ov2[:] = v2[:]; oi2[:] = i2[:]
        ov3[:] = v3[:]; oi3[:] = i3[:]
        ov4[:] = v4[:]

@functools.partial(jax.jit, static_argnames=("tq", "tc"))
def run_scan3(queries_p, q_norms_p, features_t, norms_p, *, tq, tc):
    bp, f = queries_p.shape
    np_ = features_t.shape[1]
    grid = (bp // tq, np_ // tc)
    kernel = functools.partial(k_scan3, tc=tc)
    outs = [jax.ShapeDtypeStruct((bp, 256), jnp.float32),
            jax.ShapeDtypeStruct((bp, 256), jnp.int32)] * 3 + [
            jax.ShapeDtypeStruct((bp, 256), jnp.float32)]
    out_specs = [pl.BlockSpec((tq, 256), lambda qi, cj: (qi, 0))] * 7
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((tq, f), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((tq, 1), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((f, tc), lambda qi, cj: (0, cj)),
            pl.BlockSpec((1, tc), lambda qi, cj: (0, cj)),
        ],
        out_specs=out_specs,
        out_shape=outs,
        scratch_shapes=[pltpu.VMEM((tq, 256), jnp.float32),
                        pltpu.VMEM((tq, 256), jnp.int32)] * 3 + [
                        pltpu.VMEM((tq, 256), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(queries_p, q_norms_p, features_t, norms_p)

def main():
    rng = np.random.default_rng(0)
    feats = rng.random((N, F), dtype=np.float32)
    norms = np.linalg.norm(feats, axis=1).astype(np.float32)
    unit = feats / norms[:, None]
    q = feats[rng.integers(0, N, B)]
    qn = np.linalg.norm(q, axis=1, keepdims=True).astype(np.float32)
    dfe = jax.device_put(feats)
    dno = jax.device_put(norms)
    dq32 = jax.device_put(q)

    # --- rerank cost sweep
    for C in (32, 64, 256, 768):
        cand = rng.integers(0, N, size=(B, C)).astype(np.int32)
        dcand = jax.device_put(cand)
        def chain(n):
            t0 = time.perf_counter()
            cur = dq32
            for _ in range(n):
                s, i = rerank(cur, dcand, dfe, dno, 10)
                cur = dq32 + 0.0 * s[0, 0]
            float(s[0, 0])
            return (time.perf_counter() - t0) / n
        chain(1)
        print(f"rerank C={C:4d}   {chain(20)*1e3:7.2f} ms", flush=True)

    # --- top_k cost on (B, 768)
    vals = jax.device_put(rng.random((B, 768), dtype=np.float32))
    tk = jax.jit(lambda v: jax.lax.top_k(v, 64))
    def chaintk(n):
        t0 = time.perf_counter()
        cur = vals
        for _ in range(n):
            s, i = tk(cur)
            cur = vals + 0.0 * s[0, 0]
        float(s[0, 0])
        return (time.perf_counter() - t0) / n
    chaintk(1)
    print(f"top_k 768->64    {chaintk(20)*1e3:7.2f} ms", flush=True)

    # --- scan3 kernel front-end (bf16x2)
    hi16 = np.asarray(jnp.asarray(unit, jnp.bfloat16))
    lo16 = np.asarray(jnp.asarray(unit - hi16.astype(np.float32), jnp.bfloat16))
    for tq, tc in ((512, 8192), (256, 32768), (512, 16384)):
        NP = -(-N // tc) * tc
        ft = np.zeros((24, NP), np.float32)
        ft[:12, :N] = hi16.astype(np.float32).T
        ft[12:, :N] = lo16.astype(np.float32).T
        dft = jax.device_put(jnp.asarray(ft, jnp.bfloat16))
        nrm = np.zeros((1, NP), np.float32)
        nrm[0, :N] = norms
        dnrm = jax.device_put(nrm)
        qh = np.asarray(jnp.asarray(q / qn, jnp.bfloat16))
        ql = np.asarray(jnp.asarray(q / qn - qh.astype(np.float32), jnp.bfloat16))
        qp = np.concatenate([qh.astype(np.float32), ql.astype(np.float32)], 1)
        dq = jax.device_put(jnp.asarray(qp, jnp.bfloat16))
        dqn = jax.device_put(qn)
        def chain2(n):
            t0 = time.perf_counter()
            cur = dq
            for _ in range(n):
                outs = run_scan3(cur, dqn, dft, dnrm, tq=tq, tc=tc)
                cur = (dq + (0.0 * outs[0][0, 0]).astype(jnp.bfloat16))
            float(outs[0][0, 0])
            return (time.perf_counter() - t0) / n
        try:
            t0 = time.perf_counter(); chain2(1); comp = time.perf_counter()-t0
            print(f"scan3 {tq}x{tc:6d}  {chain2(20)*1e3:7.2f} / {chain2(20)*1e3:7.2f} ms"
                  f"  compile {comp:.0f}s", flush=True)
        except Exception as e:
            print(f"scan3 {tq}x{tc}: FAILED {type(e).__name__} {str(e)[:150]}", flush=True)

if __name__ == "__main__":
    main()

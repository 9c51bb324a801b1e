"""Fused cosine-score + top-k Pallas TPU kernel.

TPU-native replacement for the reference's 3-kernel + host pipeline
(reference Recommender.cu: cublasSgemv :217-223, computeNormsKernel :48-59,
normalizeSimilaritiesKernel :62-77, full-vector D2H copy :248-249, host
min-heap :293-315).  One kernel does everything on-chip:

- the catalog is streamed through VMEM in (F, TC) tiles from a
  **transposed (F, N) layout** — lanes ride the catalog axis, so fp32
  tiles are (sublane=F→16, lane=TC) aligned instead of wasting 128-lane
  loads on a 12-wide row layout;
- per tile: MXU dot (TQ, F)x(F, TC) at fp32 precision, then the cosine
  epilogue (denominator guard 1e-8, clamp to [-1, 1] — exact reference
  semantics) fused on the VPU;
- a running top-k (scores + global indices) lives in VMEM scratch across
  the catalog-tile grid axis, maintained by **tournament insert**: per
  tile one max-reduce, then a while-loop of single-candidate sorted
  inserts that runs zero rounds when no query's tile max beats its
  k-th best (first-occurrence argmax + insert-after-equals preserve the
  lowest-index tie rule end-to-end);
- only (B, k) scores + indices are ever written to HBM — the (B, N) score
  matrix never exists (the XLA oracle materializes it: 4 GB at B=1k, N=1M).

Scores are identical to ops/similarity.py's oracle within 1 ulp of the
division; orderings match exactly (tested in tests/test_pallas_topk.py).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.core.logging import get_logger

log = get_logger(__name__)

# numpy (not jnp) scalars: jnp constants become traced values that a Pallas
# kernel body is not allowed to close over.
NEG_INF = np.float32(-np.inf)
_BIG_I32 = np.int32(2**30)


def _fused_kernel(
    q_ref,        # (TQ, F)   queries tile
    qn_ref,       # (TQ, 1)   query norms
    f_ref,        # (F, TC)   catalog tile (transposed layout)
    cn_ref,       # (1, TC)   catalog norms
    excl_ref,     # (TQ, 1)   excluded global row per query (-1 = none)
    valid_ref,    # (1, 1)    SMEM: number of valid catalog rows (pad cutoff)
    out_s_ref,    # (TQ, K)   output scores
    out_i_ref,    # (TQ, K)   output indices
    r_s,          # scratch (TQ, K) running top-k scores (sorted desc)
    r_i,          # scratch (TQ, K) running top-k indices
    s_scr,        # scratch (TQ, TC) tile scores (knockouts applied)
    v1_s,         # scratch (TQ, 128) per-lane best score
    g1_s,         # scratch (TQ, 128) per-lane best column group
    v2_s,         # scratch (TQ, 128) per-lane second-best score
    g2_s,         # scratch (TQ, 128) per-lane second-best column group
    *,
    k: int,
    tc: int,
    eps: float,
    exact: bool,
):
    """Fused score + top-k, v2: per-lane vertical top-2 + narrow tournament.

    Per tile the (TQ, TC) score matrix is reduced to a **per-lane top-2**
    structure — values v1/v2 and their column groups g1/g2, each (TQ, 128)
    — by a vertical scan over the TC//128 column groups (pure elementwise
    vreg ops, no wide cross-lane reduce).  The running top-k is then
    maintained by a tournament whose per-round work is almost entirely on
    the narrow 128-lane structure: find the best remaining candidate
    (max + lowest-global-index tie rule), insert it into the sorted
    (r_s, r_i) lists, promote that lane's second-best, and knock the
    winner out of the staged tile.  If a round ever promotes an exhausted
    slot (a lane's third candidate might matter — rare: two inserts from
    one lane in one tile), the next round first **rescans** the staged
    tile (honest per-lane top-2 of what remains), so exactness never
    depends on the 2-deep approximation.

    Tie semantics match the reference heap end-to-end (lowest catalog
    index wins): the vertical scan keeps the lowest group per lane
    (strict >), the winner pick takes the minimum global index among
    value-equal lanes, and insertion counts `>=` so earlier (lower-index)
    inserts stay ahead of later value-equal ones.

    `exact=True` reproduces the reference's division-form epilogue
    (Recommender.cu:62-77); `exact=False` expects pre-normalized rows and
    queries so the dot already IS the cosine — clamped, with the same
    1e-8 norm-product guard (zero exactly when the reference zeros).
    """
    cj = pl.program_id(1)
    num_cj = pl.num_programs(1)
    tq = r_s.shape[0]
    g = tc // 128

    @pl.when(cj == 0)
    def _init():
        r_s[:] = jnp.full(r_s.shape, NEG_INF, jnp.float32)
        r_i[:] = jnp.full(r_i.shape, -1, jnp.int32)

    # --- score tile: dot + fused cosine epilogue -------------------------
    is_bf16 = f_ref.dtype == jnp.bfloat16
    if q_ref.shape[0] <= 16 and not is_bf16:
        # Small query tiles: the MXU would pad rows to 128 and (at fp32
        # HIGHEST) run 6 passes — for tq=8 that is ~100x wasted FLOPs.  A
        # broadcast-FMA over the F dimension on the VPU is exact fp32 and
        # costs F passes over (TQ, TC), far cheaper in this regime.
        f_dim = q_ref.shape[1]
        dots = q_ref[:, 0:1] * f_ref[0:1, :]
        for d in range(1, f_dim):
            dots += q_ref[:, d : d + 1] * f_ref[d : d + 1, :]
    else:
        dots = jax.lax.dot_general(
            q_ref[:],
            f_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # bf16 storage: native single-pass MXU; fp32: 6-pass for
            # reference-exact accumulation (DEFAULT on fp32 is slower
            # than HIGHEST due to conversion — measured)
            precision=(
                jax.lax.Precision.DEFAULT
                if is_bf16
                else jax.lax.Precision.HIGHEST
            ),
        )                                                      # (TQ, TC)
    denom = qn_ref[:] * cn_ref[:]                              # (TQ, TC)
    guard = denom > jnp.float32(eps)                           # ref :68
    if exact:
        safe = jnp.where(guard, denom, jnp.float32(1.0))
        scores = jnp.where(
            guard, jnp.clip(dots / safe, -1.0, 1.0), jnp.float32(0.0)
        )
    else:
        # pre-normalized fast path: the dot IS the cosine; keep the exact
        # tier's zero-norm guard so both tiers zero the same entries
        scores = jnp.where(
            guard, jnp.clip(dots, -1.0, 1.0), jnp.float32(0.0)
        )

    # padding + self-exclusion in ONE masked select (row iota broadcasts)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, scores.shape[1]), 1)
    gcol_row = cj * tc + lane_row
    bad = (gcol_row >= valid_ref[0, 0]) | (gcol_row == excl_ref[:])  # (TQ, TC)
    scores = jnp.where(bad, NEG_INF, scores)
    s_scr[:] = scores

    def _vert_top2():
        """Per-lane top-2 of the staged tile -> v1/g1/v2/g2 scratch."""
        v1 = s_scr[:, 0:128]
        g1 = jnp.zeros((tq, 128), jnp.int32)
        v2 = jnp.full((tq, 128), NEG_INF, jnp.float32)
        g2 = jnp.zeros((tq, 128), jnp.int32)
        for gi in range(1, g):
            s = s_scr[:, gi * 128 : (gi + 1) * 128]
            beat1 = s > v1
            beat2 = jnp.logical_and(jnp.logical_not(beat1), s > v2)
            v2 = jnp.where(beat1, v1, jnp.where(beat2, s, v2))
            g2 = jnp.where(beat1, g1, jnp.where(beat2, gi, g2))
            v1 = jnp.where(beat1, s, v1)
            g1 = jnp.where(beat1, gi, g1)
        v1_s[:] = v1
        g1_s[:] = g1
        v2_s[:] = v2
        g2_s[:] = g2

    _vert_top2()

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    posk = jax.lax.broadcasted_iota(jnp.int32, (tq, k), 1)
    col_tile = jax.lax.broadcasted_iota(jnp.int32, (1, tc), 1)

    def cond(carry):
        return carry[0]

    def body(carry):
        _, rescan = carry

        @pl.when(rescan)
        def _():
            _vert_top2()

        v1 = v1_s[:]
        m = jnp.max(v1, axis=1)                            # (TQ,)
        need = m > r_s[:, k - 1]
        # winner = lowest global index among value-equal lanes
        gidx_lane = g1_s[:] * 128 + lane128                # (TQ, 128)
        win = jnp.min(
            jnp.where(v1 == m[:, None], gidx_lane, _BIG_I32), axis=1
        )                                                  # (TQ,) in [0, tc)
        # sorted insert: count of entries >= m keeps earlier (lower-index)
        # value-equal inserts ahead
        ge = jnp.sum((r_s[:] >= m[:, None]).astype(jnp.int32), axis=1)
        rolled_s = pltpu.roll(r_s[:], 1, axis=1)
        rolled_i = pltpu.roll(r_i[:], 1, axis=1)
        at = posk == ge[:, None]
        before = posk < ge[:, None]
        new_s = jnp.where(before, r_s[:], jnp.where(at, m[:, None], rolled_s))
        new_i = jnp.where(
            before, r_i[:],
            jnp.where(at, cj * tc + win[:, None], rolled_i),
        )
        nd = need[:, None]
        r_s[:] = jnp.where(nd, new_s, r_s[:])
        r_i[:] = jnp.where(nd, new_i, r_i[:])
        # narrow knockout: promote that lane's second-best
        sel = nd & (gidx_lane == win[:, None])             # (TQ, 128)
        promoted_empty = jnp.any(sel & (v2_s[:] == NEG_INF))
        v1_s[:] = jnp.where(sel, v2_s[:], v1_s[:])
        g1_s[:] = jnp.where(sel, g2_s[:], g1_s[:])
        v2_s[:] = jnp.where(sel, NEG_INF, v2_s[:])
        # full-tile knockout keeps a later rescan honest
        kn = nd & (col_tile == win[:, None])               # (TQ, TC)
        s_scr[:] = jnp.where(kn, NEG_INF, s_scr[:])
        more = jnp.any(jnp.max(v1_s[:], axis=1) > r_s[:, k - 1])
        return more | promoted_empty, promoted_empty

    go0 = jnp.any(jnp.max(v1_s[:], axis=1) > r_s[:, k - 1])
    jax.lax.while_loop(cond, body, (go0, jnp.bool_(False)))

    @pl.when(cj == num_cj - 1)
    def _write():
        out_s_ref[:] = r_s[:]
        out_i_ref[:] = r_i[:]


def _split_kernel_body(x_ref, hi_ref, lo_ref):
    x = x_ref[:]
    hi = x.astype(jnp.bfloat16)
    hi_ref[:] = hi
    lo_ref[:] = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _split_bf16x2(x: jnp.ndarray, *, interpret: bool = False):
    """Faithful bf16x2 split of fp32 `x`: hi = bf16(x), lo = bf16(x - hi).

    Computed INSIDE a Pallas kernel, and that is LOAD-BEARING: when the
    split is written as plain jnp ops inside a jit, XLA's TPU
    reduced-precision propagation sees an fp32 subtraction whose only
    consumer is a bf16 convert and demotes the whole upstream chain to
    bf16 — both operands collapse to bf16(x), the lo plane becomes ~0,
    and the split residual degrades from ~2^-18 to ~2^-9 (measured
    1.9e-3 vs 3.8e-6 on unit vectors), silently voiding the BF16X2_EPS
    bound the exactness certificate is built on.  Found by a
    compiled-TPU parity check in round 5: a true top-10 item was dropped
    WITH a passing certificate.  `jax.lax.optimization_barrier` does NOT
    stop the rewrite (tested on the sub, on its operands, and on both);
    a Mosaic kernel body is opaque to XLA and does.  tests pin the
    jitted residual (test_certified.py) and, opt-in on real TPU,
    full-batch compiled parity (test_tpu_compiled.py)."""
    m, d = x.shape
    tile = min(m, 4096)
    return pl.pallas_call(
        _split_kernel_body,
        grid=(-(-m // tile),),
        in_specs=[pl.BlockSpec((tile, d), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((m, d), jnp.bfloat16),
        ],
        interpret=interpret,
    )(x)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _bucket_batch(b: int) -> int:
    """Pad batch sizes to a bounded shape set so variable-size callers
    (e.g. the serving coalescer) hit cached jit executables instead of
    recompiling per size: powers of two up to 512, then 512-multiples.
    Worst-case padding waste is 2x compute on a half-empty bucket."""
    if b <= 8:
        return 8
    if b <= 512:
        return 1 << (b - 1).bit_length()
    return _round_up(b, 512)


def _batch_inputs(queries, exclude_rows):
    """Normalize (queries, exclusions) to kernel-ready arrays with the
    MINIMUM number of device dispatches — on tunneled backends each
    eager padding op costs a ~3 ms dispatch slot in the latency chain,
    which used to dominate B=1 latency 4-to-1 (and cost the round-5
    approx tier 2x its kernel time until it adopted this path too).

    - host (numpy) inputs: bucket-pad in numpy; padding is free and
      the jit executable set stays bounded (serving path);
    - device inputs, b <= 16: NO padding — the per-b jit cache is
      bounded by 16 small-batch programs, and the call is one
      dispatch (the kernel pads to the query tile internally);
    - device inputs, b > 16: bucket-pad (latency-insensitive regime).
    Returns (queries, excl, b, bb)."""
    if not isinstance(queries, jax.Array):
        q = np.atleast_2d(np.asarray(queries, np.float32))
        b = q.shape[0]
        bb = _bucket_batch(b)
        if bb != b:
            q = np.concatenate(
                [q, np.zeros((bb - b, q.shape[1]), np.float32)]
            )
        excl = np.full((bb,), -1, np.int32)
        if exclude_rows is not None:
            excl[:b] = np.asarray(exclude_rows, np.int32)
        return q, excl, b, bb
    q = jnp.atleast_2d(queries)
    if q.dtype != jnp.float32:
        q = q.astype(jnp.float32)
    b = q.shape[0]
    if b <= 16:
        excl = (
            np.full((b,), -1, np.int32)
            if exclude_rows is None
            else jnp.asarray(exclude_rows, jnp.int32)
        )
        return q, excl, b, b
    bb = _bucket_batch(b)
    if bb != b:
        q = jnp.zeros((bb, q.shape[1]), jnp.float32).at[:b].set(q)
        excl = jnp.full((bb,), -1, jnp.int32)
        if exclude_rows is not None:
            excl = excl.at[:b].set(
                jnp.asarray(exclude_rows, jnp.int32)
            )
    else:
        excl = (
            np.full((b,), -1, np.int32)
            if exclude_rows is None
            else jnp.asarray(exclude_rows, jnp.int32)
        )
    return q, excl, b, bb


@functools.partial(
    jax.jit,
    static_argnames=("k", "tq", "tc", "eps", "exact", "interpret"),
)
def _fused_call(
    queries_p: jnp.ndarray,   # (Bp, F)
    q_norms_p: jnp.ndarray,   # (Bp, 1)
    features_t: jnp.ndarray,  # (F, Np)
    norms_p: jnp.ndarray,     # (1, Np)
    excl_p: jnp.ndarray,      # (Bp, 1)
    valid: jnp.ndarray,       # (1, 1) int32 number of valid rows
    *,
    k: int,
    tq: int,
    tc: int,
    eps: float,
    exact: bool = True,
    interpret: bool = False,
):
    bp, f = queries_p.shape
    np_ = features_t.shape[1]
    grid = (bp // tq, np_ // tc)
    kernel = functools.partial(
        _fused_kernel, k=k, tc=tc, eps=eps, exact=exact
    )
    flops = 2 * bp * np_ * f
    bytes_accessed = (np_ * f + np_ + bp * f + bp) * 4 * (bp // tq)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, f), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((tq, 1), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((f, tc), lambda qi, cj: (0, cj)),
            pl.BlockSpec((1, tc), lambda qi, cj: (0, cj)),
            pl.BlockSpec((tq, 1), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((1, 1), lambda qi, cj: (0, 0), memory_space=pltpu.SMEM),
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
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.int32),
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(queries_p, q_norms_p, features_t, norms_p, excl_p, valid)


@functools.partial(
    jax.jit,
    static_argnames=("k", "tq", "tc", "eps", "exact", "split2", "interpret"),
)
def _prepare_and_call(
    queries: jnp.ndarray,
    exclude_rows: Optional[jnp.ndarray],
    features_t: jnp.ndarray,
    norms: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    k: int,
    tq: int,
    tc: int,
    eps: float,
    exact: bool,
    split2: bool = False,
    interpret: bool,
):
    """Pad queries + compute norms + run the kernel as ONE jit program, so
    a retrieval is a single device dispatch."""
    b, f = queries.shape
    bp = _round_up(b, tq)
    q_pad = jnp.zeros((bp, f), jnp.float32).at[:b].set(queries)
    qn = jnp.linalg.norm(q_pad, axis=1, keepdims=True)
    if not exact:
        # fast path: pre-normalize queries so the kernel's dot IS the
        # cosine; zero-norm queries stay zero (score 0, matching the
        # reference's guard semantics)
        q_pad = q_pad / jnp.maximum(qn, jnp.float32(1e-30))
    if split2:
        # bf16x2 split planes: queries as [qh, ql, ql, qh] pair with the
        # catalog's [hi, lo, hi, lo] planes so ONE dot computes the full
        # (q_hi+q_lo)·(c_hi+c_lo) product (~2^-16)
        hi, lo = _split_bf16x2(q_pad, interpret=interpret)
        q_pad = jnp.concatenate([hi, lo, lo, hi], axis=1)  # (bp, 4F) bf16
    else:
        q_pad = q_pad.astype(features_t.dtype)
    if exclude_rows is None:
        excl = jnp.full((bp, 1), -1, jnp.int32)
    else:
        excl = (
            jnp.full((bp,), -1, jnp.int32)
            .at[:b]
            .set(exclude_rows.astype(jnp.int32))[:, None]
        )
    out_s, out_i = _fused_call(
        q_pad, qn, features_t, norms, excl, valid,
        k=k, tq=tq, tc=tc, eps=eps, exact=exact,
        interpret=interpret,
    )
    return out_s[:b], out_i[:b]


class FusedRetriever:
    """Holds the catalog in kernel layout (transposed + padded, device-
    resident) and runs the fused kernel — the device-state analog of the
    reference's one-time `initialize` H2D copy (Recommender.cu:153-175)."""

    def __init__(
        self,
        features: np.ndarray,          # (N, F) row-major catalog
        norms: Optional[np.ndarray] = None,
        config: Optional[RetrievalConfig] = None,
        interpret: bool = False,
    ) -> None:
        config = config or RetrievalConfig()
        self.config = config
        self.interpret = interpret
        n, f = features.shape
        self.num_items = n
        self.feature_dim = f
        tc = min(config.catalog_tile, _round_up(n, 128))
        self.tc = tc
        np_pad = _round_up(n, tc)
        feats = np.asarray(features, np.float32)
        if norms is None:
            norms = np.linalg.norm(feats, axis=1).astype(np.float32)
        self.exact = config.exact_scores
        if config.dtype not in ("float32", "bfloat16", "bfloat16x2"):
            raise ValueError(f"unknown catalog dtype {config.dtype!r}")
        self.split2 = config.dtype == "bfloat16x2"
        self.dtype = (
            jnp.bfloat16 if config.dtype.startswith("bfloat16")
            else jnp.float32
        )
        if self.dtype == jnp.bfloat16 and self.exact:
            raise ValueError(
                "bfloat16 catalog storage requires exact_scores=False "
                "(bf16 dots cannot reproduce the reference fp32 math)"
            )
        if not self.exact:
            # fast path: rows pre-normalized at build time; zero-norm rows
            # stay zero (dot 0 -> score 0, same as the reference guard)
            feats = feats / np.maximum(norms, 1e-30)[:, None]
        if self.split2:
            # [hi, lo, hi, lo] planes paired with query [qh, ql, ql, qh]:
            # ONE bf16 MXU pass computes the full
            # (q_hi+q_lo)·(c_hi+c_lo) product to ~2^-16
            # (BF16X2_EPS derivation below)
            hi = feats.astype(np.dtype(jnp.bfloat16))
            lo = (feats - hi.astype(np.float32)).astype(np.dtype(jnp.bfloat16))
            ft = np.zeros((4 * f, np_pad), np.float32)
            hi32 = hi.astype(np.float32).T
            lo32 = lo.astype(np.float32).T
            ft[:f, :n] = hi32
            ft[f : 2 * f, :n] = lo32
            ft[2 * f : 3 * f, :n] = hi32
            ft[3 * f :, :n] = lo32
        else:
            ft = np.zeros((f, np_pad), np.float32)
            ft[:, :n] = feats.T
        nrm = np.zeros((1, np_pad), np.float32)
        nrm[0, :n] = norms
        self.features_t = jax.device_put(jnp.asarray(ft, self.dtype))
        self.norms = jax.device_put(nrm)

    def __call__(
        self,
        queries: jnp.ndarray,
        k: int,
        exclude_rows: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        queries = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        b, f = queries.shape
        if f != self.feature_dim:
            raise ValueError(f"query dim {f} != catalog dim {self.feature_dim}")
        bb = _bucket_batch(b)
        if bb != b:
            queries = jnp.zeros((bb, f), jnp.float32).at[:b].set(queries)
            if exclude_rows is not None:
                exclude_rows = (
                    jnp.full((bb,), -1, jnp.int32)
                    .at[:b]
                    .set(jnp.asarray(exclude_rows, jnp.int32))
                )
        tq = min(self.config.query_tile, _round_up(bb, 8))
        out_s, out_i = _prepare_and_call(
            queries,
            exclude_rows if exclude_rows is None else jnp.asarray(exclude_rows),
            self.features_t,
            self.norms,
            jnp.full((1, 1), self.num_items, jnp.int32),
            k=k,
            tq=tq,
            tc=self.tc,
            eps=self.config.eps,
            exact=self.exact,
            split2=self.split2,
            interpret=self.interpret,
        )
        return out_s[:b], out_i[:b]


def fused_score_topk(
    queries: jnp.ndarray,
    features: jnp.ndarray,
    norms: Optional[jnp.ndarray] = None,
    *,
    k: int = 10,
    exclude_rows: Optional[jnp.ndarray] = None,
    config: Optional[RetrievalConfig] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-shot convenience wrapper (builds kernel-layout buffers per call;
    hold a FusedRetriever for repeated queries against one catalog)."""
    fr = FusedRetriever(
        np.asarray(features), norms, config, interpret=interpret
    )
    return fr(queries, k, exclude_rows)


@functools.partial(jax.jit, static_argnames=("k", "eps"))
def _exact_rerank(
    queries: jnp.ndarray,     # (B, F) fp32 raw queries
    cand_idx: jnp.ndarray,    # (B, C) candidate rows from the prefilter
    features: jnp.ndarray,    # (N, F) fp32 row-major catalog
    norms: jnp.ndarray,       # (N,) fp32
    k: int,
    eps: float,
):
    """Exact reference-math rescore of prefiltered candidates + top-k.

    Gather is O(B*C*F); the exact epilogue (fp32 HIGHEST dots, 1e-8
    guard, clamp) matches ops/similarity.py bit-for-bit."""
    cand = features[cand_idx]                                  # (B, C, F)
    cand_n = norms[cand_idx]                                   # (B, C)
    qn = jnp.linalg.norm(queries, axis=1)
    dots = jnp.einsum(
        "bf,bcf->bc", queries, cand,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    denom = qn[:, None] * cand_n
    scores = jnp.where(
        denom > jnp.float32(eps),
        jnp.clip(dots / jnp.where(denom > jnp.float32(eps), denom, 1.0), -1, 1),
        0.0,
    )
    # prefilter marks empty slots with index -1 (short catalogs): mask them
    scores = jnp.where(cand_idx < 0, NEG_INF, scores)
    top_s, pos = jax.lax.top_k(scores, k)
    return top_s, jnp.take_along_axis(cand_idx, pos, axis=1)


class PrefilterRetriever:
    """Two-phase retrieval: bf16 fused prefilter to C candidates, then
    exact fp32 rerank — near-exact recall at approximate-tier speed.

    Not exactness-guaranteed (a true top-k item can in principle fall
    outside the bf16 top-C), so the exact single-phase kernel remains the
    default; measured recall is reported by the test suite and benchmark.

    SUPERSEDED (round 5): both phases are outperformed by newer tiers —
    `CertifiedRetriever` delivers guaranteed-exact results FASTER than
    this tier's round-1 tournament prefilter (BENCH_r04), and
    `ApproxRetriever` is the speed tier.  Kept for API compatibility.
    """

    def __init__(
        self,
        features: np.ndarray,
        norms: Optional[np.ndarray] = None,
        config: Optional[RetrievalConfig] = None,
        prefilter: int = 64,
        interpret: bool = False,
    ) -> None:
        import dataclasses as _dc

        config = config or RetrievalConfig()
        bf16_cfg = _dc.replace(config, dtype="bfloat16", exact_scores=False)
        feats = np.asarray(features, np.float32)
        if norms is None:
            norms = np.linalg.norm(feats, axis=1).astype(np.float32)
        self.prefilter = min(prefilter, feats.shape[0])
        self.eps = config.eps
        self._approx = FusedRetriever(feats, norms, bf16_cfg, interpret=interpret)
        self._features = jax.device_put(jnp.asarray(feats))
        self._norms = jax.device_put(jnp.asarray(norms))

    def __call__(
        self,
        queries: jnp.ndarray,
        k: int,
        exclude_rows: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        queries = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        c = max(k, self.prefilter)
        _, cand = self._approx(queries, c, exclude_rows)
        return _exact_rerank(
            queries, cand, self._features, self._norms, k=k, eps=self.eps
        )


# ===========================================================================
# Approximate tier: the v3 bin-scan kernel WITHOUT rerank or certificate
# ===========================================================================


@functools.partial(
    jax.jit,
    static_argnames=("k", "c", "tq", "tc", "w", "depth", "interpret"),
)
def _approx_retrieve(
    queries,        # (B, F) fp32 raw queries (may be bucket-padded)
    features_t2,    # (planes*F, Np) bf16 split planes, prenormalized rows
    excl,           # (B,) int32 excluded rows (-1 = none)
    valid,          # (1, 1) int32 valid row count
    *,
    k: int,
    c: int,
    tq: int,
    tc: int,
    w: int,
    depth: int,
    interpret: bool = False,
):
    """Approximate top-k: ONE scan-kernel dispatch, no rerank, no
    certificate, no fp32 catalog in HBM.  Scores are the bf16x2
    split-plane cosines (|err| <= BF16X2_EPS ~= 2e-5; exact zeros for
    guarded rows since zero/tiny-norm rows are stored as zero vectors).
    Exclusion and padding are masked on the (B, C) candidate structure
    after the kernel (the v3 scan itself carries no masks)."""
    b, f = queries.shape
    bp = _round_up(b, tq)
    q_pad = jnp.zeros((bp, f), jnp.float32).at[:b].set(queries)
    qn = jnp.linalg.norm(q_pad, axis=1, keepdims=True)
    qunit = q_pad / jnp.maximum(qn, jnp.float32(1e-30))
    qh, ql = _split_bf16x2(qunit, interpret=interpret)
    q2 = jnp.concatenate([qh, ql, ql, qh], axis=1)
    a_s, cand, _ = _scan_call_v3(
        q2, features_t2, tq=tq, tc=tc, w=w, depth=depth, topc=c,
        interpret=interpret,
    )
    a_s, cand = a_s[:b], cand[:b]
    bad = (
        (cand < 0)
        | (cand >= valid[0, 0])
        | (cand == excl[:, None].astype(jnp.int32))
    )
    a_s = jnp.where(bad, NEG_INF, jnp.clip(a_s, -1.0, 1.0))
    top_s, pos = jax.lax.top_k(a_s, k)
    return top_s, jnp.take_along_axis(cand, pos, axis=1)


class ApproxRetriever:
    """Speed tier: the v3 bin-scan kernel alone (round 5).

    Same split-plane scan as the certified tier but WITHOUT the exact
    rerank, certificate, or fp32 catalog copy — strictly less work and
    ~2/3 the HBM footprint, for callers that accept ~2e-5 score error
    and miss-probability ~C(k, depth+1)/W^depth per query (recall@10
    measured >= 0.999 on the benchmark workload; tests/test_pallas_topk
    reports it).  Supersedes the round-1 bf16 tournament kernel
    (`FusedRetriever(dtype="bfloat16")`) and `PrefilterRetriever`, which
    benchmarked SLOWER than the certified tier (BENCH_r04)."""

    def __init__(
        self,
        features: np.ndarray,
        norms: Optional[np.ndarray] = None,
        config: Optional[RetrievalConfig] = None,
        interpret: bool = False,
    ) -> None:
        config = config or RetrievalConfig()
        self.config = config
        self.interpret = interpret
        feats = np.asarray(features, np.float32)
        n, f = feats.shape
        self.num_items = n
        self.feature_dim = f
        lay = build_certified_layout(feats, norms, config)
        self._depth = lay.depth
        self.w = lay.w
        self.tc = lay.tc
        self.tc_small = lay.tc_small
        self.features_t2 = jax.device_put(jnp.asarray(lay.ft, jnp.bfloat16))
        self._valid = jnp.full((1, 1), n, jnp.int32)

    def __call__(
        self,
        queries: jnp.ndarray,
        k: int,
        exclude_rows: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        queries, excl, b, bb = _batch_inputs(queries, exclude_rows)
        f = queries.shape[1]
        if f != self.feature_dim:
            raise ValueError(
                f"query dim {f} != catalog dim {self.feature_dim}"
            )
        if k > self._depth * self.w:
            raise ValueError(
                f"k={k} exceeds the approx scan capacity depth*W="
                f"{self._depth * self.w}; raise RetrievalConfig.scan_bins "
                "and/or scan_depth (or use the certified tier, which "
                "falls back to the oracle for large k)"
            )
        # a few extra candidates so post-kernel masking can't starve k
        c = min(max(k + 8, self.config.prefilter), self._depth * self.w)
        tq = min(self.config.query_tile, _round_up(bb, 8))
        tc = self.tc_small if bb <= 16 else self.tc
        top_s, top_i = _approx_retrieve(
            queries, self.features_t2, excl, self._valid,
            k=k, c=c, tq=tq, tc=tc, w=self.w, depth=self._depth,
            interpret=self.interpret,
        )
        if top_s.shape[0] == b:       # unpadded batch: skip the two
            return top_s, top_i       # eager slice dispatches
        return top_s[:b], top_i[:b]


# ===========================================================================
# Certified-exact retrieval: bf16x2 scan kernel + exact rerank + certificate
# ===========================================================================
#
# BF16X2_EPS — proven bound on |approx_score - exact_score| for the split-
# plane dot, used by the exactness certificate:
#
#   stored value    u~ = hi + lo,  hi = bf16(u), lo = bf16(u - hi)
#                   per-element representation error <= 2^-18 |u|
#                   (two nested round-to-nearest at 2^-9 relative each)
#   prenormalize    u = c / ||c|| in fp32: one rounding, 2^-24 relative,
#                   and the SAME fp32 norms divide the exact tier's dots,
#                   so norm rounding cancels to first order
#   MXU dot         bf16 x bf16 products are exact in fp32; the full
#                   product needs all four plane pairs, computed as ONE
#                   48-term dot (query [qh,ql,ql,qh] vs catalog
#                   [hi,lo,hi,lo]): accumulation error
#                   <= 48 * 2^-24 * 1.01   (Cauchy-Schwarz, unit vectors)
#   exact tier      clip(dot_HIGHEST / (qn*cn)): its own fp32 error is
#                   <= (F+2) * 2^-24 on the cosine scale
#   clamp & guard   clip contracts differences; the 1e-8 guard uses the
#                   identical fp32 qn*cn product in both tiers, so guarded
#                   entries are 0 in both
#
#   total: 2 * 2^-18 + 49 * 2^-24 * 1.01 + (12+2+2) * 2^-24
#        ~= 7.63e-6 + 2.95e-6 + 0.95e-6  ~= 1.15e-5
#
# BF16X2_EPS = 2e-5 carries a ~2x safety margin; tests/test_certified.py
# additionally checks the bound empirically on random and adversarial data.
BF16X2_EPS = np.float32(2e-5)

# On TPU the certified rerank is BIT-IDENTICAL to the oracle FOR THE
# BIG-BATCH SHAPE CLASS: both compute per-element dots through the same
# (rows, F) x (F, cols) HIGHEST matmul lowering, whose per-element
# accumulation is shape-independent (verified by
# tests/test_tpu_compiled.py's bit-equality canary and full-batch
# parity), so the rerank's candidate ordering IS the oracle's ordering,
# ties included.  Tiny batches are excluded from the claim: XLA lowers a
# (1, N) oracle matmul differently (measured 1-2 ulp divergence at b=1,
# round 5), so batches bucketed <= 16 keep the gaps check below.
# XLA:CPU reassociates with SIMD (measured up to ~9.5e-7 divergence), so
# on non-TPU backends candidate-order decisions are additionally only
# certified when adjacent exact scores are separated by more than twice
# RERANK_ULP; anything closer falls back to the oracle.
RERANK_ULP = np.float32(1e-6)


def _scan_kernel(
    q_ref,        # (TQ, 2F|4F) bf16 split-plane queries
    qn_ref,       # (TQ, 1)  fp32 query norms
    f_ref,        # (2F|4F, TC) bf16 split-plane catalog tile
    cn_ref,       # (1, TC)  fp32 catalog norms
    excl_ref,     # (TQ, 1)  excluded global row (-1 = none)
    valid_ref,    # (1, 1)   SMEM: number of valid catalog rows
    ov_ref,       # out: candidate approx scores — (TQ, 3W), or (TQ, C)
    oi_ref,       # out: candidate global indices — (TQ, 3W), or (TQ, C)
    ob_ref,       # out: 4th-best coverage bound — (TQ, W), or (TQ, 1)
    *scratch,     # compact mode: (TQ,3W) f32, (TQ,3W) i32, (TQ,W) f32
    tc: int,
    w: int,
    eps: float,
    topc: int,
    interpret: bool,
):
    """Reduce catalog tiles to per-bin depth-3 candidates + 4th-best bound.

    Bins = (slice_index mod (w/128), lane): every catalog column maps to a
    fixed bin; each bin keeps its top-3 (scores + indices, lowest-index
    tie rule via strict >) and the value of its 4th-best.  Any item
    missing from the candidate set is, by construction, <= its bin's v4 —
    the certificate's coverage bound.  Pure elementwise scan: no wide
    cross-lane reduction, no tournament loop, no staging (those dominated
    the round-1 kernel; see docs/PERFORMANCE.md round-2 ablation).

    With `topc` > 0 the kernel ALSO extracts the top-`topc` candidates by
    approx value on its last grid step (topc rounds of masked argmax over
    the narrow (TQ, 3W) structure — executed once per query tile, ~free)
    and emits compact (TQ, C) outputs plus the scalar coverage bound, so
    the caller needs no XLA top_k over the 3W structure at all.  The
    selection's value-ties break by structure slot (not global index) —
    sound for the certificate, which only needs "non-candidates <= a_C".
    """
    cj = pl.program_id(1)
    num_cj = pl.num_programs(1)
    tq = q_ref.shape[0]
    nw = w // 128
    g = tc // 128

    if topc:
        sv_ref, si_ref, sb_ref = scratch   # structures persist in scratch
    else:
        sv_ref, si_ref, sb_ref = ov_ref, oi_ref, ob_ref

    @pl.when(cj == 0)
    def _init():
        sv_ref[:] = jnp.full(sv_ref.shape, NEG_INF, jnp.float32)
        si_ref[:] = jnp.full(si_ref.shape, -1, jnp.int32)
        sb_ref[:] = jnp.full(sb_ref.shape, NEG_INF, jnp.float32)

    if interpret:
        # the TPU MXU multiplies bf16 pairs exactly and accumulates in
        # fp32 — the BF16X2_EPS bound assumes exactly that.  The CPU
        # interpreter instead accumulates bf16 dots in bf16 (~2^-9
        # error), so emulate the MXU semantics with an fp32-upcast dot.
        qv = q_ref[:].astype(jnp.float32)
        fv = f_ref[:].astype(jnp.float32)
    else:
        qv = q_ref[:]
        fv = f_ref[:]
    # full split-plane product (q_hi+q_lo)·(c_hi+c_lo): the query always
    # carries [qh, ql, ql, qh].  4-plane catalogs ([hi,lo,hi,lo]) need
    # ONE 4F-wide MXU pass; 2-plane catalogs ([hi,lo], half the HBM
    # stream for the small-batch/large-catalog regime) pair the query
    # halves with the planes in TWO passes.
    if qv.shape[1] == fv.shape[0]:
        dots = jax.lax.dot_general(
            qv,
            fv,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,   # single-pass bf16 MXU
        )                                                   # (TQ, TC) fp32
    else:
        f2 = fv.shape[0]
        dots = jax.lax.dot_general(
            qv[:, :f2], fv,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) + jax.lax.dot_general(
            qv[:, f2:], fv,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    denom = qn_ref[:] * cn_ref[:]
    scores = jnp.where(
        denom > jnp.float32(eps), jnp.clip(dots, -1.0, 1.0), jnp.float32(0.0)
    )
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, tc), 1)
    gcol_row = cj * tc + lane_row
    bad = (gcol_row >= valid_ref[0, 0]) | (gcol_row == excl_ref[:])
    scores = jnp.where(bad, NEG_INF, scores)

    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    # running structures as VALUES within the tile (register-carried)
    v1 = [sv_ref[:, ww * 128 : (ww + 1) * 128] for ww in range(nw)]
    v2 = [sv_ref[:, (nw + ww) * 128 : (nw + ww + 1) * 128] for ww in range(nw)]
    v3 = [
        sv_ref[:, (2 * nw + ww) * 128 : (2 * nw + ww + 1) * 128]
        for ww in range(nw)
    ]
    i1 = [si_ref[:, ww * 128 : (ww + 1) * 128] for ww in range(nw)]
    i2 = [si_ref[:, (nw + ww) * 128 : (nw + ww + 1) * 128] for ww in range(nw)]
    i3 = [
        si_ref[:, (2 * nw + ww) * 128 : (2 * nw + ww + 1) * 128]
        for ww in range(nw)
    ]
    v4 = [sb_ref[:, ww * 128 : (ww + 1) * 128] for ww in range(nw)]

    for gi in range(g):
        ww = gi % nw
        s = jax.lax.slice(scores, (0, gi * 128), (tq, (gi + 1) * 128))
        idx = cj * tc + gi * 128 + lane
        # strict > keeps the earlier (lower-index) item at each level —
        # the reference heap's lowest-index tie rule (Recommender.cu:300)
        c1 = s > v1[ww]
        c2 = s > v2[ww]
        c3 = s > v3[ww]
        # 4th-best bound: the value evicted past depth 3 is min(s, v3) —
        # v3 when s inserts above it, s when s lands below — and the
        # bound only ever grows: max(v4, min(s, v3)) == the branchy
        # where(c3, v3, where(s > v4, s, v4)) in 2 VPU ops instead of 3
        v4[ww] = jnp.maximum(v4[ww], jnp.minimum(s, v3[ww]))
        v3[ww] = jnp.where(c2, v2[ww], jnp.where(c3, s, v3[ww]))
        i3[ww] = jnp.where(c2, i2[ww], jnp.where(c3, idx, i3[ww]))
        v2[ww] = jnp.where(c1, v1[ww], jnp.where(c2, s, v2[ww]))
        i2[ww] = jnp.where(c1, i1[ww], jnp.where(c2, idx, i2[ww]))
        v1[ww] = jnp.where(c1, s, v1[ww])
        i1[ww] = jnp.where(c1, idx, i1[ww])

    for ww in range(nw):
        sv_ref[:, ww * 128 : (ww + 1) * 128] = v1[ww]
        sv_ref[:, (nw + ww) * 128 : (nw + ww + 1) * 128] = v2[ww]
        sv_ref[:, (2 * nw + ww) * 128 : (2 * nw + ww + 1) * 128] = v3[ww]
        si_ref[:, ww * 128 : (ww + 1) * 128] = i1[ww]
        si_ref[:, (nw + ww) * 128 : (nw + ww + 1) * 128] = i2[ww]
        si_ref[:, (2 * nw + ww) * 128 : (2 * nw + ww + 1) * 128] = i3[ww]
        sb_ref[:, ww * 128 : (ww + 1) * 128] = v4[ww]

    if topc:

        @pl.when(cj == num_cj - 1)
        def _extract():
            vals = sv_ref[:]                                # (TQ, 3W)
            idxs = si_ref[:]
            slot = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
            posc = jax.lax.broadcasted_iota(jnp.int32, (tq, topc), 1)
            out_v = jnp.full((tq, topc), NEG_INF, jnp.float32)
            out_i = jnp.full((tq, topc), -1, jnp.int32)
            run = vals
            for r in range(topc):
                m = jnp.max(run, axis=1)
                am = jnp.min(
                    jnp.where(run == m[:, None], slot, _BIG_I32), axis=1
                )
                onehot = slot == am[:, None]
                gidx = jnp.max(jnp.where(onehot, idxs, -1), axis=1)
                at = posc == r
                out_v = jnp.where(at, m[:, None], out_v)
                out_i = jnp.where(at, gidx[:, None], out_i)
                run = jnp.where(onehot, NEG_INF, run)
            ov_ref[:] = out_v
            oi_ref[:] = out_i
            ob_ref[:] = jnp.max(sb_ref[:], axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("tq", "tc", "w", "eps", "topc", "interpret")
)
def _scan_call(
    queries_p, q_norms_p, features_t, norms_p, excl_p, valid,
    *, tq: int, tc: int, w: int, eps: float, topc: int = 0,
    interpret: bool = False,
):
    bp, qw = queries_p.shape
    fr, np_ = features_t.shape
    grid = (bp // tq, np_ // tc)
    kernel = functools.partial(
        _scan_kernel, tc=tc, w=w, eps=eps, topc=topc, interpret=interpret
    )
    if topc:
        out_specs = [
            pl.BlockSpec((tq, topc), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((tq, topc), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((tq, 1), lambda qi, cj: (qi, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bp, topc), jnp.float32),
            jax.ShapeDtypeStruct((bp, topc), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        ]
        scratch = [
            pltpu.VMEM((tq, 3 * w), jnp.float32),
            pltpu.VMEM((tq, 3 * w), jnp.int32),
            pltpu.VMEM((tq, w), jnp.float32),
        ]
    else:
        out_specs = [
            pl.BlockSpec((tq, 3 * w), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((tq, 3 * w), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((tq, w), lambda qi, cj: (qi, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bp, 3 * w), jnp.float32),
            jax.ShapeDtypeStruct((bp, 3 * w), jnp.int32),
            jax.ShapeDtypeStruct((bp, w), jnp.float32),
        ]
        scratch = []
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, qw), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((tq, 1), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((fr, tc), lambda qi, cj: (0, cj)),
            pl.BlockSpec((1, tc), lambda qi, cj: (0, cj)),
            pl.BlockSpec((tq, 1), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((1, 1), lambda qi, cj: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(queries_p, q_norms_p, features_t, norms_p, excl_p, valid)


def _scan_kernel_v3(
    q_ref,        # (TQ, P*F) bf16 split-plane UNIT queries
    f_ref,        # (P*F, TC) bf16 split-plane prenormalized catalog tile
    ov_ref,       # out (TQ, topc) candidate approx scores
    oi_ref,       # out (TQ, topc) candidate global indices
    ob_ref,       # out (TQ, 1)   coverage bound (best (depth+1)-th per bin)
    sv_ref,       # scratch (TQ, depth*W) f32 bin values
    si_ref,       # scratch (TQ, depth*W) i32 bin indices
    sb_ref,       # scratch (TQ, W) f32 per-bin (depth+1)-th-best bound
    *,
    tc: int,
    w: int,
    depth: int,
    topc: int,
    interpret: bool,
):
    """Epilogue-free bin scan (v3): raw split-plane dots ARE the approx
    scores.

    The round-2 kernel spent more VPU time on the cosine epilogue +
    masking than on the bin structure itself (round-3 ablation,
    experiments/kernel_r3.py: depth-3 + epilogue 64.8 ms vs a bare
    depth-1 scan 24.0 ms at 10M/B=1024 against an 18.5 ms MXU floor).
    v3 removes every per-element epilogue op by construction:

    - catalog rows and queries are unit vectors, so the MXU dot IS the
      cosine (no denominator, no guard, no clamp in the hot loop) —
      zero-norm rows/queries are stored as zeros and score exactly 0,
      reproducing the reference guard (Recommender.cu:67-72) at the
      exact-rerank stage;
    - no self-exclusion mask: the query's own row simply becomes a
      candidate and is excluded during the exact rerank;
    - no padding mask: pad columns are zero vectors scoring 0; the
      rerank masks candidate indices >= valid instead.  (Pad items can
      displace real candidates only when real scores are <= 0 en masse —
      then the certificate fails and the oracle fallback serves truth.)

    `depth` and `w` are configurable: each of the W bins keeps its
    top-`depth` (values + indices, lowest-index tie rule via strict >)
    plus the value of its (depth+1)-th best.  The production default is
    depth=3 @ W=128: the round-4 sweep (experiments/scan_sweep_r4*.py,
    recorded in docs/PERFORMANCE.md) measured the scan REGISTER-PRESSURE-
    bound, not op-count-bound — at 10M/B=1024 depth-3 W=128 scans in
    31.5 ms vs 46.2 ms for depth-2 W=1024 (fewer live (TQ,128) structure
    slots beats fewer compares), with 0 measured fallbacks (a coverage
    failure needs >3 of the true top-k hashing to ONE of the 128 bins,
    ~1e-4/query at k=10).
    """
    cj = pl.program_id(1)
    num_cj = pl.num_programs(1)
    tq = q_ref.shape[0]
    nw = w // 128
    g = tc // 128

    @pl.when(cj == 0)
    def _init():
        sv_ref[:] = jnp.full(sv_ref.shape, NEG_INF, jnp.float32)
        si_ref[:] = jnp.full(si_ref.shape, -1, jnp.int32)
        sb_ref[:] = jnp.full(sb_ref.shape, NEG_INF, jnp.float32)

    if interpret:
        # emulate MXU semantics (bf16 multiplies, fp32 accumulate) on CPU
        qv = q_ref[:].astype(jnp.float32)
        fv = f_ref[:].astype(jnp.float32)
    else:
        qv = q_ref[:]
        fv = f_ref[:]
    if qv.shape[1] == fv.shape[0]:
        dots = jax.lax.dot_general(
            qv, fv,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )                                                   # (TQ, TC) fp32
    else:
        f2 = fv.shape[0]
        dots = jax.lax.dot_general(
            qv[:, :f2], fv,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) + jax.lax.dot_general(
            qv[:, f2:], fv,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    # register-carried bin structures (value-level, written back once)
    v = [
        [sv_ref[:, (lv * nw + ww) * 128:(lv * nw + ww + 1) * 128]
         for ww in range(nw)]
        for lv in range(depth)
    ]
    iv = [
        [si_ref[:, (lv * nw + ww) * 128:(lv * nw + ww + 1) * 128]
         for ww in range(nw)]
        for lv in range(depth)
    ]
    bnd = [sb_ref[:, ww * 128:(ww + 1) * 128] for ww in range(nw)]

    for gi in range(g):
        ww = gi % nw
        s = jax.lax.slice(dots, (0, gi * 128), (tq, (gi + 1) * 128))
        idx = cj * tc + gi * 128 + lane
        # strict > keeps the earlier (lower-index) item at each level —
        # the reference heap's lowest-index tie rule (Recommender.cu:300)
        c = [s > v[lv][ww] for lv in range(depth)]
        # evicted-past-depth value is min(s, v[depth-1]) (s when it lands
        # below, the old deepest when s inserts anywhere above)
        bnd[ww] = jnp.maximum(bnd[ww], jnp.minimum(s, v[depth - 1][ww]))
        for lv in range(depth - 1, 0, -1):
            v[lv][ww] = jnp.where(
                c[lv - 1], v[lv - 1][ww], jnp.where(c[lv], s, v[lv][ww])
            )
            iv[lv][ww] = jnp.where(
                c[lv - 1], iv[lv - 1][ww], jnp.where(c[lv], idx, iv[lv][ww])
            )
        v[0][ww] = jnp.where(c[0], s, v[0][ww])
        iv[0][ww] = jnp.where(c[0], idx, iv[0][ww])

    for lv in range(depth):
        for ww in range(nw):
            sv_ref[:, (lv * nw + ww) * 128:(lv * nw + ww + 1) * 128] = (
                v[lv][ww]
            )
            si_ref[:, (lv * nw + ww) * 128:(lv * nw + ww + 1) * 128] = (
                iv[lv][ww]
            )
    for ww in range(nw):
        sb_ref[:, ww * 128:(ww + 1) * 128] = bnd[ww]

    @pl.when(cj == num_cj - 1)
    def _extract():
        vals = sv_ref[:]                                # (TQ, depth*W)
        idxs = si_ref[:]
        slot = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
        posc = jax.lax.broadcasted_iota(jnp.int32, (tq, topc), 1)
        out_v = jnp.full((tq, topc), NEG_INF, jnp.float32)
        out_i = jnp.full((tq, topc), -1, jnp.int32)
        run = vals
        for r in range(topc):
            m = jnp.max(run, axis=1)
            am = jnp.min(
                jnp.where(run == m[:, None], slot, _BIG_I32), axis=1
            )
            onehot = slot == am[:, None]
            gidx = jnp.max(jnp.where(onehot, idxs, -1), axis=1)
            at = posc == r
            out_v = jnp.where(at, m[:, None], out_v)
            out_i = jnp.where(at, gidx[:, None], out_i)
            run = jnp.where(onehot, NEG_INF, run)
        ov_ref[:] = out_v
        oi_ref[:] = out_i
        ob_ref[:] = jnp.max(sb_ref[:], axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("tq", "tc", "w", "depth", "topc", "interpret")
)
def _scan_call_v3(
    queries_p,       # (Bp, P*F) bf16 split-plane unit queries
    features_t,      # (P*F, Np) bf16 split-plane prenormalized catalog
    *, tq: int, tc: int, w: int, depth: int, topc: int,
    interpret: bool = False,
):
    bp, qw = queries_p.shape
    fr, np_ = features_t.shape
    grid = (bp // tq, np_ // tc)
    kernel = functools.partial(
        _scan_kernel_v3, tc=tc, w=w, depth=depth, topc=topc,
        interpret=interpret,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, qw), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((fr, tc), lambda qi, cj: (0, cj)),
        ],
        out_specs=[
            pl.BlockSpec((tq, topc), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((tq, topc), lambda qi, cj: (qi, 0)),
            pl.BlockSpec((tq, 1), lambda qi, cj: (qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, topc), jnp.float32),
            jax.ShapeDtypeStruct((bp, topc), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, depth * w), jnp.float32),
            pltpu.VMEM((tq, depth * w), jnp.int32),
            pltpu.VMEM((tq, w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(queries_p, features_t)


def _rerank_certify(
    queries,        # (m, F) fp32 raw queries
    qn1,            # (m,) fp32 query norms
    a_s,            # (m, C) approx candidate scores (extraction order)
    cand,           # (m, C) candidate global indices (extraction order)
    cb,             # (m, 1) coverage bound
    excl,           # (m,) int32 excluded rows
    features32,     # (N, F) fp32 row-major catalog
    norms1d,        # (N,) fp32
    nvalid_rows,    # () int32 true item count
    rn_min,         # () fp32 min nonzero catalog norm, or None
    *,
    k: int,
    c: int,
    eps: float,
    ceps: float,
    scan: str,
    bitexact_rerank: bool,
):
    """Exact fp32 rerank of scan candidates + per-query certificate.

    Shared by the main certified pass and the depth-escalation rescan
    (same math, different candidate sets).  Returns (top_s, top_i, ok).
    See `_certified_retrieve` for the certificate's soundness argument.
    """
    m, f = queries.shape
    # ascending-index candidate order => lax.top_k's earlier-position tie
    # preference reproduces the reference's lowest-index rule
    order = jnp.argsort(jnp.where(cand < 0, _BIG_I32, cand), axis=1)
    cand = jnp.take_along_axis(cand, order, axis=1)
    safe = jnp.clip(cand, 0, features32.shape[0] - 1)
    rn = norms1d[safe]
    # rerank dots as PLAIN 2-D (rows, F) x (F, cols) matmuls over gathered
    # candidate columns — the same HLO shape class as the oracle's
    # catalog matmul, whose per-element fp32 accumulation is
    # shape-independent on TPU => rerank scores are bitwise the oracle's
    # (the order-safety foundation; see RERANK_ULP note above).  Grouped
    # so the (g, g*C) block product stays small.
    gsz = min(m, 512)
    bp2 = _round_up(m, gsz)
    q_p2 = jnp.zeros((bp2, f), jnp.float32).at[:m].set(queries)
    safe_p = jnp.zeros((bp2, c), jnp.int32).at[:m].set(safe)
    group_dots = []
    diag = (
        jnp.arange(gsz, dtype=jnp.int32)[:, None] * c
        + jnp.arange(c, dtype=jnp.int32)[None, :]
    )
    for g in range(bp2 // gsz):
        rows_g = safe_p[g * gsz : (g + 1) * gsz]            # (gsz, C)
        cols_g = features32[rows_g.reshape(-1)].T           # (F, gsz*C)
        d_g = jnp.dot(
            q_p2[g * gsz : (g + 1) * gsz], cols_g,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                   # (gsz, gsz*C)
        group_dots.append(jnp.take_along_axis(d_g, diag, axis=1))
    dots = jnp.concatenate(group_dots, axis=0)[:m]          # (m, C)
    den = qn1[:, None] * rn
    guard = den > jnp.float32(eps)
    ex = jnp.where(
        guard,
        jnp.clip(dots / jnp.where(guard, den, 1.0), -1.0, 1.0),
        0.0,
    )
    bad_cand = cand < 0
    if scan == "v3":
        # the v3 scan carries no masks: drop the query's own row and any
        # pad columns (index >= valid) here, at (m, C) cost
        bad_cand = (
            bad_cand
            | (cand >= nvalid_rows)
            | (cand == excl[:, None].astype(jnp.int32))
        )
    ex = jnp.where(bad_cand, NEG_INF, ex)
    kk = min(k + 1, c)
    top_s1, p2 = jax.lax.top_k(ex, kk)
    top_i = jnp.take_along_axis(cand, p2, axis=1)[:, :k]
    top_s = top_s1[:, :k]
    s_k = top_s[:, k - 1]
    a_c = a_s[:, c - 1]
    v4max = cb[:, 0]
    # coverage: every non-candidate's exact score provably < s_k
    ok = jnp.maximum(a_c, v4max) + jnp.float32(ceps) < s_k
    if scan == "v3" and rn_min is not None:
        # guard-awareness (see _certified_retrieve docstring): v3 approx
        # scores do NOT bound exact scores for guarded rows (exact = 0
        # regardless of cosine), so when a guardable row can exist
        # require s_k > 0
        guard_possible = qn1 * rn_min <= jnp.float32(eps)
        ok = ok & (~guard_possible | (s_k > jnp.float32(0.0)))
    # order safety: on TPU the rerank is oracle-bitwise (see above) so
    # candidate ordering is certified unconditionally; elsewhere adjacent
    # top-(k+1) exact scores must be separated by more than any legal
    # fp32 re-summation disagreement, else the order is implementation-
    # ambiguous -> fall back
    if not bitexact_rerank:
        gaps_ok = jnp.all(
            top_s1[:, :-1] - top_s1[:, 1:] > 2.0 * RERANK_ULP, axis=1
        )
        ok = ok & gaps_ok
    return top_s, top_i, ok


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "c", "tq", "tc", "w", "eps", "ceps", "fallback_cap",
        "bitexact_rerank", "interpret", "scan", "depth", "esc",
        "debug_scan",
    ),
)
def _certified_retrieve(
    queries,        # (B, F) fp32 raw queries (may be bucket-padded)
    features_t2,    # (kF, Np) bf16 split planes, prenormalized rows
    norms_row,      # (1, Np) fp32 catalog norms
    features32,     # (N, F) fp32 row-major catalog (for the exact rerank)
    norms1d,        # (N,) fp32
    excl,           # (B,) int32 excluded rows (-1 = none)
    valid,          # (1, 1) int32 valid row count
    nreal=None,     # () int32 real query count (padded rows are exempted
                    # from the certificate: their outputs are discarded)
    rn_min=None,    # () fp32 minimum NONZERO catalog norm (v3 guard bound)
    *,
    k: int,
    c: int,
    tq: int,
    tc: int,
    w: int,
    eps: float,
    ceps: float,
    fallback_cap: int = 0,
    bitexact_rerank: bool = False,
    interpret: bool = False,
    scan: str = "v2",
    depth: int = 3,
    esc: int = 0,
    debug_scan: bool = False,   # also return raw (a_s, cand, cb)
):
    """One-dispatch certified retrieval (the device never syncs mid-way:
    every extra chained dispatch costs a full tunnel round-trip).

    scan kernel -> approx top-C of the bin candidates -> sort-by-index
    -> exact fp32 rerank (reference math) -> per-query certificate:

        max(a_C, vBmax) + ceps < s_k
          a_C:   C-th best approx (bounds items dropped by truncation)
          vBmax: best (depth+1)-th-per-bin value (bounds items dropped
                 by bins; depth=3 for the v2 scan, configurable for v3)
          s_k:   k-th best EXACT score among the reranked candidates

    If it holds, every non-candidate's exact score < s_k, so the exact
    top-k is inside the candidate set and the reranked result is exactly
    the reference's (scores bit-equal: same fp32 HIGHEST dot + epilogue).

    scan="v3" uses the epilogue-free kernel (_scan_kernel_v3): the scan
    sees no exclusion/padding masks, so this function additionally masks
    excluded and padded candidate indices before the top-k.  For UNGUARDED
    rows the scan's raw-dot approx scores upper-bound the exact score
    within ceps (the clamp only shrinks |score|, and prenormalized
    zero-norm rows dot to 0 = their exact score).  GUARDED rows
    (qn*rn <= eps, reference Recommender.cu:67-72) are the one case where
    the exact epilogue RAISES a score: a tiny-nonzero-norm row
    prenormalizes to a full unit vector whose raw cosine can be strongly
    negative while its exact score is pinned to 0.  The certificate is
    therefore made guard-aware: when any catalog row could be guarded for
    this query (qn * rn_min_nonzero <= eps), it additionally requires
    s_k > 0 — guardable rows score exactly 0 in the exact tier, so
    s_k > 0 proves none of them belongs in the top-k; otherwise the query
    falls back to the oracle.
    """
    b, f = queries.shape
    bp = _round_up(b, tq)
    q_pad = jnp.zeros((bp, f), jnp.float32).at[:b].set(queries)
    qn = jnp.linalg.norm(q_pad, axis=1, keepdims=True)
    qunit = q_pad / jnp.maximum(qn, jnp.float32(1e-30))
    qh, ql = _split_bf16x2(qunit, interpret=interpret)
    # [qh,ql | ql,qh]: dot([qh,ql],[hi;lo]) + dot([ql,qh],[hi;lo]) =
    # qh·hi + ql·lo + ql·hi + qh·lo = (qh+ql)·(hi+lo)
    q2 = jnp.concatenate([qh, ql, ql, qh], axis=1)
    # the kernel extracts the top-C candidates itself (masked-argmax
    # rounds over the narrow structure at its last grid step) — no XLA
    # top_k over the bin structure needed
    if scan == "v3":
        a_s, cand, cb = _scan_call_v3(
            q2, features_t2,
            tq=tq, tc=tc, w=w, depth=depth, topc=c, interpret=interpret,
        )
    else:
        excl_p = jnp.full((bp, 1), -1, jnp.int32).at[:b, 0].set(
            excl.astype(jnp.int32)
        )
        a_s, cand, cb = _scan_call(
            q2, qn, features_t2, norms_row, excl_p, valid,
            tq=tq, tc=tc, w=w, eps=eps, topc=c, interpret=interpret,
        )
    a_s, cand, cb = a_s[:b], cand[:b], cb[:b]               # (B, C) x2, (B, 1)
    if debug_scan:
        return a_s, cand, cb
    nvalid_rows = valid[0, 0]                # true item count (pre-pad)
    qn1 = qn[:b, 0]
    top_s, top_i, ok = _rerank_certify(
        queries, qn1, a_s, cand, cb, excl, features32, norms1d,
        nvalid_rows, rn_min if scan == "v3" else None,
        k=k, c=c, eps=eps, ceps=ceps, scan=scan,
        bitexact_rerank=bitexact_rerank,
    )
    if nreal is not None:
        # bucket-padding rows (all-zero queries) legitimately score 0
        # everywhere and would fail the certificate for nothing — their
        # outputs are sliced away by the caller
        ok = ok | (jnp.arange(b, dtype=jnp.int32) >= nreal)

    # ---- depth-escalation rescan (scan="v3" only): before any oracle
    # fallback, certificate-failing queries are re-scanned ONCE at the
    # deeper bin depth `esc` and re-certified.  This is what makes the
    # fast shallow production scan safe: depth-2 W=128 scans ~30% faster
    # than depth-3 but fails ~1.5% of uniform-random queries (round-4
    # sweep, docs/PERFORMANCE.md) — far past the oracle fallback's
    # capacity cliff.  The rescan streams the catalog once more for just
    # the (<= 32) failing queries, so a failing batch pays ~a B=32
    # retrieval extra instead of cap-limited (cap, N) oracle GEMMs, and
    # zero-failure batches skip it entirely (lax.cond).
    nesc = jnp.int32(0)
    if esc > depth and scan == "v3":
        ecap = min(32, b)
        tq_e = _round_up(ecap, 8)
        iota_b = jnp.arange(b, dtype=jnp.int32)
        esel = jnp.where(~ok, -iota_b, jnp.int32(-(2**30)))
        evtop, _ = jax.lax.top_k(esel, ecap)   # first ecap failing rows
        evalid = evtop > jnp.int32(-(2**30))
        eidx = jnp.where(evalid, -evtop, 0)
        nesc = jnp.sum((~ok).astype(jnp.int32))

        def run_esc(args):
            top_s, top_i, ok = args
            eq2 = (
                jnp.zeros((tq_e, q2.shape[1]), q2.dtype)
                .at[:ecap]
                .set(q2[eidx])
            )
            a_s2, cand2, cb2 = _scan_call_v3(
                eq2, features_t2,
                tq=tq_e, tc=tc, w=w, depth=esc, topc=c,
                interpret=interpret,
            )
            ts2, ti2, ok2 = _rerank_certify(
                queries[eidx], qn1[eidx], a_s2[:ecap], cand2[:ecap],
                cb2[:ecap], excl[eidx], features32, norms1d,
                nvalid_rows, rn_min,
                k=k, c=c, eps=eps, ceps=ceps, scan=scan,
                bitexact_rerank=bitexact_rerank,
            )
            # splice ONLY rows that are real failures AND now certified;
            # everything else scatters out of bounds and is dropped (see
            # the fallback splice note on duplicate-index scatters)
            upd = evalid & ok2
            eidx_w = jnp.where(upd, eidx, jnp.int32(b))
            top_s = top_s.at[eidx_w].set(ts2, mode="drop")
            top_i = top_i.at[eidx_w].set(ti2, mode="drop")
            ok = ok.at[eidx_w].set(True, mode="drop")
            return top_s, top_i, ok

        top_s, top_i, ok = jax.lax.cond(
            nesc > 0, run_esc, lambda a: a, (top_s, top_i, ok)
        )

    if fallback_cap <= 0:
        return top_s, top_i, ok, jnp.bool_(False), nesc

    # ---- in-jit oracle fallback (device-resident: a host round-trip on
    # tunneled backends costs ~30 ms, so the certify-check/fallback/splice
    # must never leave the chip).  Up to `fallback_cap` failing queries
    # are gathered, rescored with the ORACLE's exact math (k masked
    # first-argmax passes = lax.top_k's lowest-index tie rule on
    # bit-identical cosine_scores values), and scattered back.
    cap = min(fallback_cap, b)   # can't gather more rows than the batch
    iota_b = jnp.arange(b, dtype=jnp.int32)
    sel_val = jnp.where(~ok, -iota_b, jnp.int32(-(2**30)))
    vtop, _ = jax.lax.top_k(sel_val, cap)          # first cap failing rows
    fvalid = vtop > jnp.int32(-(2**30))
    fidx = jnp.where(fvalid, -vtop, 0)             # (cap,)
    nfail = jnp.sum((~ok).astype(jnp.int32))
    overflow = nfail > cap

    def run_fallback(args):
        top_s, top_i = args
        fq = queries[fidx]                                  # (cap, F)
        fqn = jnp.linalg.norm(fq, axis=1)
        fdots = jnp.dot(
            fq, features32.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                   # (cap, N)
        fden = fqn[:, None] * norms1d[None, :]
        fsc = jnp.where(
            fden > jnp.float32(eps),
            jnp.clip(fdots / fden, -1.0, 1.0),
            jnp.float32(0.0),
        )
        fex = excl[fidx].astype(jnp.int32)
        cols = jnp.arange(features32.shape[0], dtype=jnp.int32)[None, :]
        # one fused mask: self-exclusion + catalog pad rows
        fsc = jnp.where(
            (cols == fex[:, None]) | (cols >= nvalid_rows), NEG_INF, fsc
        )
        # blockwise two-phase top-k: ONE pass computes per-block maxima;
        # each of the k rounds then argmaxes the tiny (cap, nb) block-max
        # table and rescans ONLY the winning 512-column block (with the
        # already-extracted entries masked), so the score matrix is
        # traversed once, not k times.  Selection = global first-argmax =
        # lax.top_k's lowest-index tie rule: the first maximal block, then
        # the first maximal column inside it.
        blk = 512
        nb = features32.shape[0] // blk
        fsc3 = fsc.reshape(cap, nb, blk)
        bmax = jnp.max(fsc3, axis=2)                        # (cap, nb)
        rows_c = jnp.arange(cap)
        biota = jnp.arange(blk, dtype=jnp.int32)[None, :]   # (1, blk)
        taken = jnp.full((cap, k), -1, jnp.int32)           # extracted ids
        fs_list, fi_list = [], []
        for r in range(k):
            bm = jnp.argmax(bmax, axis=1).astype(jnp.int32)     # (cap,)
            sel = jnp.take_along_axis(
                fsc3, bm[:, None, None], axis=1
            )[:, 0, :]                                          # (cap, blk)
            gcol = bm[:, None] * blk + biota                    # (cap, blk)
            if r:  # mask entries already extracted (one broadcasted
                # compare per round; un-set `taken` slots are -1 and can
                # never match a non-negative global column)
                hit = jnp.any(
                    gcol[:, :, None] == taken[:, None, :], axis=2
                )
                sel = jnp.where(hit, NEG_INF, sel)
            val = jnp.max(sel, axis=1)
            am = jnp.argmax(sel, axis=1).astype(jnp.int32)
            gidx = bm * blk + am
            fs_list.append(val)
            fi_list.append(gidx)
            taken = taken.at[:, r].set(gidx)
            # the winning block's residual max after removing the pick
            sel2 = jnp.where(biota == am[:, None], NEG_INF, sel)
            bmax = bmax.at[rows_c, bm].set(jnp.max(sel2, axis=1))
        fs = jnp.stack(fs_list, axis=1)
        fi = jnp.stack(fi_list, axis=1)
        # unused capacity slots write OUT OF BOUNDS and are dropped —
        # never splice through duplicate in-bounds indices: XLA scatter's
        # duplicate-winner is unspecified, so a dummy slot aliasing a
        # real row could overwrite the oracle result with the stale value
        fidx_w = jnp.where(fvalid, fidx, jnp.int32(b))
        return (
            top_s.at[fidx_w].set(fs, mode="drop"),
            top_i.at[fidx_w].set(fi, mode="drop"),
        )

    top_s, top_i = jax.lax.cond(
        nfail > 0, run_fallback, lambda a: a, (top_s, top_i)
    )
    return top_s, top_i, ok, overflow, nesc


@dataclasses.dataclass
class CertifiedLayout:
    """Host-side kernel layout for the certified tier.

    Built ONCE per catalog by `build_certified_layout` and shared by the
    single-chip `CertifiedRetriever` and the multi-chip sharded path
    (parallel/sharding.py ShardedCatalog) so both always run the SAME
    kernel generation with the same tuning — the sharded path scales out
    exactly what the reference runs on one GPU (Recommender.cu:124)."""

    tc: int                 # catalog tile (lane axis)
    tc_small: int           # big tile for grid-overhead-bound tiny batches
    w: int                  # scan bin width (multiple of 128)
    depth: int              # per-bin candidate depth (v3)
    scan: str               # "v3" (epilogue-free) or "v2"
    planes: int             # split-plane count of `ft` (4 or 2)
    np_pad: int             # padded catalog length (columns of `ft`)
    ft: np.ndarray          # (planes*F, np_pad) fp32 split planes (cast
                            # to bf16 at device_put)
    ft_small: Optional[np.ndarray]  # 2-plane slice for the small-batch
                            # HBM-stream-bound regime, or None
    nrm_row: np.ndarray     # (1, np_pad) fp32 catalog norms
    feats32: np.ndarray     # (rows, F) fp32 row-major catalog, rows a
                            # multiple of the in-jit fallback's 512 block
    norms1d: np.ndarray     # (rows,) fp32
    rn_min: float           # min NONZERO norm (v3 certificate guard bound)


def build_certified_layout(
    features: np.ndarray,
    norms: Optional[np.ndarray],
    config: RetrievalConfig,
    *,
    n_shards: int = 1,
) -> CertifiedLayout:
    """Build the certified tier's host-side buffers + tile parameters.

    With ``n_shards > 1`` every padded axis is additionally a multiple of
    the shard count so each shard's slice tiles evenly by ``tc`` AND by
    the in-jit oracle fallback's 512-column blocks; the dual small-batch
    layout is single-chip-only (multi-chip serving batches per shard are
    already small after data-sharding)."""
    feats = np.asarray(features, np.float32)
    n, f = feats.shape
    if norms is None:
        norms = np.linalg.norm(feats, axis=1).astype(np.float32)
    norms = np.asarray(norms, np.float32)

    scan = config.scan
    depth = config.scan_depth if scan == "v3" else 3
    if n_shards > 1:
        tc = min(
            config.catalog_tile, 128 * max(1, -(-n // (128 * n_shards)))
        )
    else:
        tc = min(config.catalog_tile, _round_up(n, 128))
    # bin width must divide the tile's 128-lane slice count.  v3 default
    # W=128 at depth 3: the round-4 sweep measured the scan REGISTER-
    # PRESSURE-bound, not op-count-bound (docs/PERFORMANCE.md); v2 keeps
    # its round-3 width of 4.  config.scan_bins overrides for large-k.
    if scan == "v3":
        nw = max(1, config.scan_bins // 128) if config.scan_bins else 1
        if config.scan_bins and (
            config.scan_bins % 128 or config.scan_bins != 128 * nw
        ):
            log.warning(
                "scan_bins=%d is not a multiple of 128; using W=%d",
                config.scan_bins, 128 * nw,
            )
    else:
        nw = 4
    while nw > 1 and (tc // 128) % nw:
        nw //= 2
        log.warning(
            "scan bin count reduced to W=%d (must divide the catalog "
            "tile's %d lane slices)", 128 * nw, tc // 128,
        )
    w = 128 * nw

    # small batches are grid-step-overhead-bound: with the catalog padded
    # to the LARGE tile, the same buffer serves any dividing tile size,
    # so tiny batches can run 8x-bigger tiles per call (single-chip only)
    if n_shards == 1 and n >= 65536:
        tc_small = max(tc, min(65536, _round_up(n, 128)))
        if tc_small % tc:
            tc_small = tc
    else:
        tc_small = tc

    if n_shards > 1:
        # per-shard slice must tile by tc AND by the fallback's 512 blocks
        unit = math.lcm(tc, 512)
        chunk = n_shards * unit
        np_pad = -(-n // chunk) * chunk
    else:
        np_pad = _round_up(n, max(tc, tc_small))

    unit_rows = feats / np.maximum(norms, 1e-30)[:, None]
    hi = unit_rows.astype(np.dtype(jnp.bfloat16))
    lo = (unit_rows - hi.astype(np.float32)).astype(np.dtype(jnp.bfloat16))
    hi32 = hi.astype(np.float32).T
    lo32 = lo.astype(np.float32).T
    # 4 planes are only free while the contraction stays inside one
    # 128-wide MXU pass; beyond that (F > 32) the 2-plane layout does
    # the same number of passes at HALF the bytes streamed
    planes = 4 if (config.split_planes != 2 and 4 * f <= 128) else 2
    ft = np.zeros((planes * f, np_pad), np.float32)
    ft[:f, :n] = hi32
    ft[f : 2 * f, :n] = lo32
    if planes == 4:
        ft[2 * f : 3 * f, :n] = hi32
        ft[3 * f :, :n] = lo32
    # dual layout: small batches are HBM-stream-bound, where the 2-plane
    # [hi, lo] layout halves the bytes per item (two MXU passes instead
    # of one — the MXU is idle at small B anyway).  Holding both costs
    # +50% catalog HBM, only worth it from 2M items up (the measured
    # crossover; see CertifiedRetriever) — single-chip only.
    ft_small = (
        ft[: 2 * f] if (n_shards == 1 and planes == 4 and n >= 2_000_000)
        else None
    )
    nrm_row = np.zeros((1, np_pad), np.float32)
    nrm_row[0, :n] = norms

    # fp32 catalog for the exact rerank + in-jit oracle fallback: padded
    # so the fallback can reshape scores into 512-column blocks without a
    # (cap, N)-sized pad copy; sharded layouts pad to the full np_pad so
    # every shard's row slice is identical and 512-aligned
    rows = np_pad if n_shards > 1 else _round_up(n, 512)
    feats32 = np.zeros((rows, f), np.float32)
    feats32[:n] = feats
    norms1d = np.zeros((rows,), np.float32)
    norms1d[:n] = norms

    # minimum NONZERO catalog norm: the v3 certificate's guard bound
    # (a query can have guarded rows only when qn * rn_min <= eps);
    # all-zero catalogs never trigger it (every row dots to 0 = its
    # exact score, so the plain coverage bound is already sound)
    nz = norms[norms > 0.0]
    rn_min = float(nz.min()) if nz.size else float(np.finfo(np.float32).max)

    return CertifiedLayout(
        tc=tc, tc_small=tc_small, w=w, depth=depth, scan=scan,
        planes=planes, np_pad=np_pad, ft=ft, ft_small=ft_small,
        nrm_row=nrm_row, feats32=feats32, norms1d=norms1d, rn_min=rn_min,
    )


class CertifiedRetriever:
    """Exact retrieval at approximate-tier speed, with a proof.

    Default exact path on TPU: a bf16x2 split-plane prefilter kernel
    selects candidates, an exact fp32 rerank scores them with the
    reference's math, and a per-query **certificate** (see
    `_certified_retrieve`) proves the result equals the full exact
    retrieval.  The rare failures (adversarial near-ties within
    BF16X2_EPS, or >3 of the top-k colliding in one of the W bins —
    measured 0/1024 queries on the benchmark workload) fall back to the
    exact single-phase path for just those queries, so the result is
    ALWAYS exact.  Replaces reference Recommender.cu:184-318 end to end.
    """

    def __init__(
        self,
        features: np.ndarray,
        norms: Optional[np.ndarray] = None,
        config: Optional[RetrievalConfig] = None,
        interpret: bool = False,
        sync_check: bool = True,
    ) -> None:
        config = config or RetrievalConfig()
        self.config = config
        self.interpret = interpret
        feats = np.asarray(features, np.float32)
        n, f = feats.shape
        self.num_items = n
        self.feature_dim = f
        lay = build_certified_layout(feats, norms, config)
        self._scan = lay.scan
        self._depth = lay.depth
        # depth-escalation rescan (see _certified_retrieve): only
        # meaningful above the base depth, v3 only
        self._esc = (
            config.scan_escalate
            if (lay.scan == "v3" and config.scan_escalate > lay.depth)
            else 0
        )
        self.w = lay.w
        self.tc = lay.tc
        self.tc_small = lay.tc_small
        self.features_t2 = jax.device_put(jnp.asarray(lay.ft, jnp.bfloat16))
        self.features_t2_small = (
            jax.device_put(jnp.asarray(lay.ft_small, jnp.bfloat16))
            if lay.ft_small is not None else None
        )
        self.norms_row = jax.device_put(lay.nrm_row)
        self.features32 = jax.device_put(jnp.asarray(lay.feats32))
        self.norms1d = jax.device_put(jnp.asarray(lay.norms1d))
        self._valid = jnp.full((1, 1), n, jnp.int32)
        self._rn_min = jnp.float32(lay.rn_min)
        self.fallbacks = 0   # observability: certificate-failure count
        self.escalations = 0  # queries that took the depth-esc rescan
        # in-jit oracle fallback capacity: bounds the (cap, N) score
        # matrix the fallback branch may materialize (32 x 1M fp32 =
        # 128 MB HBM, ~1 ms); >cap simultaneous certificate failures
        # (needs >3% of a 1k batch provably ambiguous at once) trigger
        # the correct-but-slower host-side overflow path instead
        self.fallback_cap = max(
            1, min(32, 128_000_000 // max(1, n))
        )
        # certificate margin: configurable LOOSER than the proven bound
        # (more fallbacks, never unsound); attempts to go below the
        # proven BF16X2_EPS are clamped
        self._ceps = float(max(config.certify_eps, BF16X2_EPS))
        # sync_check=True (default): one scalar host check per call —
        # negligible on directly-attached TPUs, ~30 ms on tunneled dev
        # backends, where benchmarks pass sync_check=False and drain
        # verify_no_overflow() after the timed loop
        self.sync_check = sync_check
        self._pending: list = []

    def _warn_large_k(self, k: int) -> None:
        """k beyond the scan structure's depth*W capacity silently takes
        the full oracle path — a large latency cliff.  Log ONCE, pointing
        at the knobs that raise the capacity."""
        if not getattr(self, "_large_k_warned", False):
            self._large_k_warned = True
            log.warning(
                "k=%d exceeds the certified scan capacity depth*W=%d; "
                "falling back to the full oracle (slower).  Raise "
                "RetrievalConfig.scan_bins (W) and/or scan_depth to keep "
                "large-k retrievals on the certified tier.",
                k, self._depth * self.w,
            )

    def _fallback(self, queries, k, exclude_rows):
        """Oracle-exact retrieval for certificate-failing queries.

        Small failing subsets (the normal case: a few per thousand) run
        the iterative oracle — one GEMM + k masked-argmax passes,
        bit-identical to the parity oracle (same score function, same
        lowest-index tie rule) at ~1-2 ms for B<=128 at N=1M; the chunked
        scan only guards the (B x N) score-matrix memory for
        pathologically large failing subsets."""
        from spotify_recommender_tpu.ops import similarity

        b = queries.shape[0]
        if b * self.num_items <= 256_000_000:
            return similarity.exact_topk_iterative(
                queries,
                self.features32,
                self.norms1d,
                exclude_rows=exclude_rows,
                k=k,
                eps=self.config.eps,
            )
        return similarity.exact_topk_chunked(
            queries,
            self.features32,
            self.norms1d,
            exclude_rows=exclude_rows,
            k=k,
            eps=self.config.eps,
        )

    def _batch_inputs(self, queries, exclude_rows):
        return _batch_inputs(queries, exclude_rows)

    def __call__(
        self,
        queries: jnp.ndarray,
        k: int,
        exclude_rows: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        queries, excl, b, bb = self._batch_inputs(queries, exclude_rows)
        f = queries.shape[1]
        if f != self.feature_dim:
            raise ValueError(
                f"query dim {f} != catalog dim {self.feature_dim}"
            )
        c = min(max(self.config.prefilter, k), self._depth * self.w)
        if k > self._depth * self.w:
            self._warn_large_k(k)
            return self._fallback(
                jnp.asarray(queries)[:b], k, jnp.asarray(excl)[:b]
            )
        tq = min(self.config.query_tile, _round_up(bb, 8))
        tc = self.tc_small if bb <= 16 else self.tc
        cap = min(bb, self.fallback_cap)
        small = bb <= 16 and self.features_t2_small is not None
        top_s, top_i, ok, overflow, nesc = _certified_retrieve(
            queries,
            self.features_t2_small if small else self.features_t2,
            self.norms_row,
            self.features32,
            self.norms1d,
            excl,
            self._valid,
            jnp.int32(b),
            self._rn_min,
            k=k, c=c, tq=tq, tc=tc, w=self.w,
            eps=self.config.eps, ceps=self._ceps,
            fallback_cap=cap,
            # bitwise rerank==oracle is canary-proven only for the
            # big-batch matmul shape class; tiny batches (the oracle
            # lowers (1, N) differently — measured 1-2 ulp) keep the
            # RERANK_ULP gaps check as on CPU
            bitexact_rerank=jax.default_backend() == "tpu" and bb > 16,
            scan=self._scan, depth=self._depth, esc=self._esc,
            interpret=self.interpret,
        )
        # certificate-failing queries were already rescored on-device by
        # the in-jit oracle fallback; only the (essentially impossible)
        # >cap overflow needs host handling
        if self.sync_check:
            # ONE host round trip for all scalars (round trips dominate
            # on tunneled backends)
            overflow_h, nfail_h, nesc_h = jax.device_get(
                (overflow, jnp.sum((~ok).astype(jnp.int32)), nesc)
            )
            if bool(overflow_h):
                s_o, i_o = self._handle_overflow(
                    queries, k, excl, top_s, top_i, nreal=b
                )
                return s_o[:b], i_o[:b]
            self.fallbacks += int(nfail_h)
            self.escalations += int(nesc_h)
        else:
            self._pending.append((overflow, ok, nesc))
        if top_s.shape[0] == b:       # unpadded small batch: skip the
            return top_s, top_i       # two eager slice dispatches
        return top_s[:b], top_i[:b]

    def _handle_overflow(self, queries, k, excl, top_s, top_i, nreal=None):
        """>fallback_cap ambiguous queries in one batch: rerun ALL
        certificate failures through the host-side oracle (slow, correct,
        ~never taken — requires >cap sub-2e-6 near-ties at once).

        `nreal` is the TRUE batch size: bucket-pad rows beyond it are
        exempted from the certificate (their outputs are discarded by the
        caller) so they neither get oracle-rescored nor inflate
        self.fallbacks."""
        if nreal is None:
            nreal = queries.shape[0]
        _, _, ok, _, _ = _certified_retrieve(
            queries, self.features_t2, self.norms_row, self.features32,
            self.norms1d, excl, self._valid, jnp.int32(nreal),
            self._rn_min,
            k=k, c=min(max(self.config.prefilter, k), self._depth * self.w),
            tq=min(self.config.query_tile, _round_up(queries.shape[0], 8)),
            tc=self.tc, w=self.w, eps=self.config.eps,
            ceps=self._ceps, fallback_cap=0,
            bitexact_rerank=jax.default_backend() == "tpu",
            scan=self._scan, depth=self._depth, esc=self._esc,
            interpret=self.interpret,
        )
        ok_h = np.asarray(ok)
        bad = np.nonzero(~ok_h)[0]
        self.fallbacks += len(bad)
        fs, fi = self._fallback(queries[bad], k, excl[bad])
        s_h = np.asarray(top_s)
        i_h = np.asarray(top_i)
        s_h[bad] = np.asarray(fs)
        i_h[bad] = np.asarray(fi)
        return jnp.asarray(s_h), jnp.asarray(i_h)

    def retrieve_sync(
        self,
        queries: jnp.ndarray,
        k: int,
        exclude_rows: Optional[jnp.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Certified retrieval with results + overflow flag fetched in ONE
        host round trip (serving hot path; each RT costs ~30 ms on
        tunneled backends).  Returns numpy arrays."""
        q_in, e_in, b, bb = self._batch_inputs(queries, exclude_rows)
        f = q_in.shape[1]
        if f != self.feature_dim:
            raise ValueError(
                f"query dim {f} != catalog dim {self.feature_dim}"
            )
        c = min(max(self.config.prefilter, k), self._depth * self.w)
        if k > self._depth * self.w:
            self._warn_large_k(k)
            fs, fi = self._fallback(
                jnp.asarray(q_in)[:b], k, jnp.asarray(e_in)[:b]
            )
            return np.asarray(fs), np.asarray(fi)
        tq = min(self.config.query_tile, _round_up(bb, 8))
        tc = self.tc_small if bb <= 16 else self.tc
        cap = min(bb, self.fallback_cap)
        small = bb <= 16 and self.features_t2_small is not None
        top_s, top_i, ok, overflow, nesc = _certified_retrieve(
            q_in,
            self.features_t2_small if small else self.features_t2,
            self.norms_row, self.features32,
            self.norms1d, e_in, self._valid, jnp.int32(b),
            self._rn_min,
            k=k, c=c, tq=tq, tc=tc, w=self.w,
            eps=self.config.eps, ceps=self._ceps,
            fallback_cap=cap,
            bitexact_rerank=jax.default_backend() == "tpu" and bb > 16,
            scan=self._scan, depth=self._depth, esc=self._esc,
            interpret=self.interpret,
        )
        s_h, i_h, overflow_h, nfail_h, nesc_h = jax.device_get(
            (top_s, top_i, overflow,
             jnp.sum((~ok).astype(jnp.int32)), nesc)
        )
        if bool(overflow_h):
            s_o, i_o = self._handle_overflow(
                q_in, k, e_in, top_s, top_i, nreal=b
            )
            return np.asarray(s_o)[:b], np.asarray(i_o)[:b]
        self.fallbacks += int(nfail_h)
        self.escalations += int(nesc_h)
        return s_h[:b], i_h[:b]

    def verify_no_overflow(self) -> int:
        """Drain deferred overflow flags (sync_check=False mode): returns
        the number of batches whose in-jit fallback capacity overflowed
        (must be 0 for the results to be trusted as exact); also folds the
        deferred certificate-failure counts into self.fallbacks."""
        bad_batches = 0
        for overflow, ok, nesc in self._pending:
            if bool(overflow):
                bad_batches += 1
            self.fallbacks += int(jnp.sum(~ok))
            self.escalations += int(nesc)
        self._pending.clear()
        return bad_batches

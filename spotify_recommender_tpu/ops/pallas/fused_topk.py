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

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spotify_recommender_tpu.core.config import RetrievalConfig

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
    s_scr,        # scratch (TQ, TC) tile scores (mutated during inserts)
    *,
    k: int,
    tc: int,
    eps: float,
    exact: bool,
):
    """Tournament-insert top-k (see module docstring).

    Per tile: one MXU dot + cosine epilogue + one per-query max.  The
    running top-k is updated by a while-loop of *single-candidate
    inserts*: each round takes every query's current tile max, inserts it
    into that query's sorted (scores, indices) lists where it beats the
    k-th best, masks it from the tile, and stops as soon as NO query can
    improve.  Expected rounds per tile ≈ 0 in steady state (the k-th-best
    threshold rises fast), so the amortized cost stays at dot + ~1 max
    pass — the argmax and everything else is computed lazily inside the
    loop body, only on rounds that actually insert.

    `exact=True` reproduces the reference's division-form epilogue
    (Recommender.cu:62-77); `exact=False` expects pre-normalized rows and
    queries so the dot already IS the cosine (clamp only)."""
    cj = pl.program_id(1)
    num_cj = pl.num_programs(1)
    tq = r_s.shape[0]

    @pl.when(cj == 0)
    def _init():
        r_s[:] = jnp.full(r_s.shape, NEG_INF, jnp.float32)
        r_i[:] = jnp.full(r_i.shape, -1, jnp.int32)

    # --- score tile: dot + fused cosine epilogue -------------------------
    is_bf16 = f_ref.dtype == jnp.bfloat16
    if q_ref.shape[0] <= 16 and not is_bf16:
        # Small query tiles: the MXU would pad rows to 128 and (at fp32
        # HIGHEST) run 6 passes — for tq=8 that's ~100x wasted FLOPs.  A
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
    if exact:
        denom = qn_ref[:] * cn_ref[:]                          # (TQ, TC)
        guard = denom > jnp.float32(eps)                       # ref :68
        safe = jnp.where(guard, denom, jnp.float32(1.0))
        scores = jnp.where(
            guard, jnp.clip(dots / safe, -1.0, 1.0), jnp.float32(0.0)
        )
    else:
        scores = jnp.clip(dots, -1.0, 1.0)

    # padding + self-exclusion in ONE masked select (row iota broadcasts)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, scores.shape[1]), 1)
    gcol_row = cj * tc + lane_row                               # (1, TC)
    bad = (gcol_row >= valid_ref[0, 0]) | (gcol_row == excl_ref[:])  # (TQ, TC)
    scores = jnp.where(bad, NEG_INF, scores)

    # steady-state per-tile cost ends here: one max + scalar any()
    m0 = jnp.max(scores, axis=1)
    go0 = jnp.any(m0 > r_s[:, k - 1])

    # the insert loop needs the tile in mutable scratch; skip the copy on
    # the (common) no-insert tiles
    @pl.when(go0)
    def _stage():
        s_scr[:] = scores

    posk = jax.lax.broadcasted_iota(jnp.int32, (tq, k), 1)

    def cond(carry):
        return carry[0]

    def body(carry):
        _, m = carry
        need = m > r_s[:, k - 1]                           # (TQ,)
        # lazy argmax: first (lowest-lane) position of the row max
        lane = jax.lax.broadcasted_iota(jnp.int32, s_scr.shape, 1)
        am = jnp.min(
            jnp.where(s_scr[:] == m[:, None], lane, _BIG_I32), axis=1
        )
        # insertion index: count of entries >= m (ties keep the
        # earlier-inserted = lower-index entry ahead)
        ge = jnp.sum(
            (r_s[:] >= m[:, None]).astype(jnp.int32), axis=1
        )                                                  # (TQ,)
        gidx = cj * tc + am                                # (TQ,)
        rolled_s = pltpu.roll(r_s[:], 1, axis=1)
        rolled_i = pltpu.roll(r_i[:], 1, axis=1)
        at = posk == ge[:, None]
        before = posk < ge[:, None]
        new_s = jnp.where(
            before, r_s[:], jnp.where(at, m[:, None], rolled_s)
        )
        new_i = jnp.where(
            before, r_i[:], jnp.where(at, gidx[:, None], rolled_i)
        )
        nd = need[:, None]
        r_s[:] = jnp.where(nd, new_s, r_s[:])
        r_i[:] = jnp.where(nd, new_i, r_i[:])
        # knock the inserted candidate out of the tile
        s_scr[:] = jnp.where(
            nd & (lane == am[:, None]), NEG_INF, s_scr[:]
        )
        m2 = jnp.max(s_scr[:], axis=1)
        return jnp.any(m2 > r_s[:, k - 1]), m2

    # while_loop with a false initial condition runs zero rounds — no
    # pl.when wrapper needed (and nesting control flow stalls Mosaic).
    jax.lax.while_loop(cond, body, (go0, m0))

    @pl.when(cj == num_cj - 1)
    def _write():
        out_s_ref[:] = r_s[:]
        out_i_ref[:] = r_i[:]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


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
    static_argnames=("k", "tq", "tc", "eps", "exact", "interpret"),
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
        self.dtype = (
            jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
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
        tq = min(self.config.query_tile, _round_up(b, 8))
        return _prepare_and_call(
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
            interpret=self.interpret,
        )


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

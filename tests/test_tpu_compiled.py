"""Compiled-Mosaic kernel parity on REAL TPU hardware.

Round-1 verdict: every kernel parity test ran in interpret mode on CPU;
nothing checked the compiled kernel on the chip.  This module closes that
gap.  It SKIPS unless the session runs against a TPU:

    SRT_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -q

(conftest.py forces the CPU backend otherwise, so the whole suite stays
runnable on any host).  Production tilings are exercised: tq=512/tc=8192,
unaligned N, exclusions, the certified tier end to end, and the bf16
approximate tier's recall.
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="requires real TPU (run with SRT_TPU_TESTS=1 on a TPU host)",
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    n = 300_000 + 57          # unaligned: exercises pad masking at tc=8192
    feats = rng.random((n, 12), dtype=np.float32)
    norms = np.linalg.norm(feats, axis=1).astype(np.float32)
    rows = rng.integers(0, n, 1024).astype(np.int32)
    queries = feats[rows]
    return feats, norms, queries, rows


class TestCompiledCertified:
    def test_certified_matches_oracle_production_tiling(self, data):
        import jax.numpy as jnp

        from spotify_recommender_tpu.ops.pallas.fused_topk import (
            CertifiedRetriever,
        )
        from spotify_recommender_tpu.ops.similarity import exact_topk_chunked

        feats, norms, queries, rows = data
        cr = CertifiedRetriever(feats, norms)
        s, i = cr(queries, 10, exclude_rows=rows)
        rs, ri = exact_topk_chunked(
            jnp.asarray(queries), jnp.asarray(feats), jnp.asarray(norms),
            exclude_rows=jnp.asarray(rows), k=10,
        )
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(rs), rtol=0, atol=1e-6
        )

    def test_fused_exact_fp32_matches_oracle(self, data):
        import jax.numpy as jnp

        from spotify_recommender_tpu.ops.pallas.fused_topk import (
            FusedRetriever,
        )
        from spotify_recommender_tpu.ops.similarity import exact_topk_chunked

        feats, norms, queries, rows = data
        fr = FusedRetriever(feats, norms)
        s, i = fr(queries[:256], 10, exclude_rows=rows[:256])
        rs, ri = exact_topk_chunked(
            jnp.asarray(queries[:256]), jnp.asarray(feats),
            jnp.asarray(norms), exclude_rows=jnp.asarray(rows[:256]), k=10,
        )
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))

    def test_bf16_tier_recall(self, data):
        import jax.numpy as jnp

        from spotify_recommender_tpu.core.config import RetrievalConfig
        from spotify_recommender_tpu.ops.pallas.fused_topk import (
            FusedRetriever,
        )
        from spotify_recommender_tpu.ops.similarity import exact_topk_chunked

        feats, norms, queries, rows = data
        fr = FusedRetriever(
            feats, norms, RetrievalConfig(dtype="bfloat16", exact_scores=False)
        )
        _, i = fr(queries[:512], 10, exclude_rows=rows[:512])
        _, ri = exact_topk_chunked(
            jnp.asarray(queries[:512]), jnp.asarray(feats),
            jnp.asarray(norms), exclude_rows=jnp.asarray(rows[:512]), k=10,
        )
        i, ri = np.asarray(i), np.asarray(ri)
        recall = np.mean(
            [len(set(a) & set(b)) / 10.0 for a, b in zip(i, ri)]
        )
        assert recall > 0.85, f"bf16 tier recall {recall}"

    def test_small_batch_path(self, data):
        import jax.numpy as jnp

        from spotify_recommender_tpu.ops.pallas.fused_topk import (
            CertifiedRetriever,
        )
        from spotify_recommender_tpu.ops.similarity import exact_topk_chunked

        feats, norms, queries, rows = data
        cr = CertifiedRetriever(feats, norms)
        s, i = cr(queries[:1], 10, exclude_rows=rows[:1])
        _, ri = exact_topk_chunked(
            jnp.asarray(queries[:1]), jnp.asarray(feats), jnp.asarray(norms),
            exclude_rows=jnp.asarray(rows[:1]), k=10,
        )
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


class TestBitEqualityCanary:
    """The certified tier's order-safety rests on this hardware property:
    per-element fp32 HIGHEST matmul accumulation on TPU is independent of
    the matmul's other dimensions, so the gathered-column rerank matmul
    reproduces the oracle's catalog-matmul scores BITWISE.  If an XLA/
    Mosaic upgrade ever breaks this, this canary fails loudly and
    RERANK_ULP gap-checking must be enabled on TPU too."""

    def test_rerank_matmul_bitwise_equals_oracle(self):
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        n, f = 200_000, 12
        feats = jnp.asarray(rng.random((n, f), dtype=np.float32))
        for b, c, gsz in [(512, 32, 512), (512, 32, 128), (8, 50, 8)]:
            q = jnp.asarray(rng.random((b, f), dtype=np.float32))
            cand = jnp.asarray(rng.integers(0, n, (b, c)).astype(np.int32))
            dots = jnp.dot(q, feats.T, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            want = np.asarray(jnp.take_along_axis(dots, cand, axis=1))
            got = []
            diag = (np.arange(gsz)[:, None] * c + np.arange(c)[None, :])
            for g in range(b // gsz):
                rows_g = cand[g * gsz : (g + 1) * gsz]
                cols_g = feats[rows_g.reshape(-1)].T
                d_g = jnp.dot(q[g * gsz : (g + 1) * gsz], cols_g,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                got.append(np.asarray(
                    jnp.take_along_axis(d_g, jnp.asarray(diag), axis=1)))
            got = np.concatenate(got, axis=0)
            assert (got == want).all(), (
                f"bitwise rerank/oracle divergence at b={b} c={c} gsz={gsz}: "
                f"max |diff| {np.abs(got - want).max()}"
            )


class TestEpsBoundOnChip:
    """BF16X2_EPS soundness on the REAL MXU: the scan kernel's approx
    scores (compiled Mosaic, hardware accumulation order) must stay
    within the proven bound of the fp32 oracle cosine for every (query,
    candidate) pair the kernel surfaces."""

    def test_scan_scores_within_eps(self):
        import jax.numpy as jnp

        from spotify_recommender_tpu.ops.pallas.fused_topk import (
            BF16X2_EPS,
            CertifiedRetriever,
            _round_up,
            _scan_call,
        )

        rng = np.random.default_rng(11)
        n, f, b = 150_000, 12, 256
        feats = rng.random((n, f), dtype=np.float32)
        norms = np.linalg.norm(feats, axis=1).astype(np.float32)
        q = feats[rng.integers(0, n, b)]
        cr = CertifiedRetriever(feats, norms)
        tq = 256
        bp = _round_up(b, tq)
        q_pad = np.zeros((bp, f), np.float32)
        q_pad[:b] = q
        qn = np.linalg.norm(q_pad, axis=1, keepdims=True).astype(np.float32)
        qunit = q_pad / np.maximum(qn, 1e-30)
        qh = jnp.asarray(qunit, jnp.bfloat16)
        ql = jnp.asarray(qunit - np.asarray(qh, np.float32), jnp.bfloat16)
        q4 = jnp.concatenate([qh, ql, ql, qh], axis=1)
        excl = jnp.full((bp, 1), -1, jnp.int32)
        cv, ci, cb = _scan_call(
            q4, jnp.asarray(qn), cr.features_t2, cr.norms_row, excl,
            cr._valid, tq=tq, tc=cr.tc, w=cr.w, eps=1e-8,
        )
        cv = np.asarray(cv[:b])
        ci = np.asarray(ci[:b])
        # exact fp32 cosine for every surfaced candidate
        valid = ci >= 0
        safe = np.clip(ci, 0, n - 1)
        rows = feats[safe]                                   # (b, 3W, f)
        dots = np.einsum("bf,bcf->bc", q, rows, dtype=np.float32)
        den = qn[:b] * norms[safe]
        exact = np.where(
            den > 1e-8, np.clip(dots / np.where(den > 1e-8, den, 1), -1, 1), 0
        )
        err = np.abs(np.where(valid, cv - exact, 0.0))
        assert err.max() < BF16X2_EPS, f"on-chip eps violation: {err.max()}"


class TestSplitPlaneIntegrity:
    """Round-5 regression: XLA's TPU reduced-precision propagation
    demoted the in-jit lo-plane subtraction to bf16 (lo ~ 0), silently
    voiding the BF16X2_EPS certificate bound — a true top-10 item was
    dropped WITH a passing certificate.  The split now lives in a Pallas
    kernel (_split_bf16x2), which XLA cannot rewrite."""

    def test_jitted_split_residual_faithful(self):
        import jax.numpy as jnp

        from spotify_recommender_tpu.ops.pallas.fused_topk import (
            _split_bf16x2,
        )

        @jax.jit
        def prep(queries):
            qn = jnp.linalg.norm(queries, axis=1, keepdims=True)
            qu = queries / jnp.maximum(qn, jnp.float32(1e-30))
            qh, ql = _split_bf16x2(qu)
            return qh, ql, qu

        rng = np.random.default_rng(5)
        q = rng.random((1024, 12), dtype=np.float32)
        qh, ql, qu = map(np.asarray, prep(q))
        res = np.abs(
            qh.astype(np.float32) + ql.astype(np.float32) - qu
        ).max()
        # faithful split: residual ~2^-18; the demotion bug gave ~2^-9
        assert res < 1e-5, f"split residual {res} — lo plane demoted?"

    def test_batched_perturbed_parity_with_escalation(self, data):
        """Perturbed queries put true top-k items near certificate
        boundaries — exactly the construction that exposed the demotion
        (unperturbed self-queries are too well separated to notice)."""
        import jax.numpy as jnp

        from spotify_recommender_tpu.ops.pallas.fused_topk import (
            CertifiedRetriever,
        )
        from spotify_recommender_tpu.ops.similarity import exact_topk

        feats, norms, _, rows = data
        rng = np.random.default_rng(11)
        q = feats[rows] + (
            1e-4 * rng.standard_normal((len(rows), 12))
        ).astype(np.float32)
        cr = CertifiedRetriever(feats, norms, sync_check=False)
        s, i = cr(q, 10, exclude_rows=rows)
        assert cr.verify_no_overflow() == 0
        es, ei = exact_topk(
            jnp.asarray(q), jnp.asarray(feats), jnp.asarray(norms),
            exclude_rows=jnp.asarray(rows), k=10,
        )
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(es))

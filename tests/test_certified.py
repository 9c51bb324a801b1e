"""CertifiedRetriever: exactness-by-certificate retrieval.

The certificate's claim — "when it passes, the result equals the full
exact retrieval; when it fails, the fallback path delivers exactness
anyway" — is tested here on random data, unaligned catalog sizes,
exclusions, and two adversarial constructions (near-ties inside the
BF16X2_EPS bound, and >3 top-k items colliding in one scan bin).
Kernels run in interpret mode (CPU backend, conftest).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.ops.pallas.fused_topk import (
    BF16X2_EPS,
    CertifiedRetriever,
)
from spotify_recommender_tpu.ops.similarity import exact_topk


def oracle(queries, feats, norms, k, excl=None):
    return exact_topk(
        jnp.asarray(queries), jnp.asarray(feats), jnp.asarray(norms),
        exclude_rows=None if excl is None else jnp.asarray(excl), k=k,
    )


def make_data(rng, n, f=12, b=16):
    feats = rng.random((n, f), dtype=np.float32)
    norms = np.linalg.norm(feats, axis=1).astype(np.float32)
    q = feats[rng.integers(0, n, b)] + 0.01 * rng.standard_normal(
        (b, f)
    ).astype(np.float32)
    return feats, norms, q


class TestCertifiedExactness:
    @pytest.mark.parametrize("n", [1000, 8192, 20000 + 37])
    def test_matches_oracle(self, rng, n):
        feats, norms, q = make_data(rng, n)
        cr = CertifiedRetriever(feats, norms, interpret=True)
        s, i = cr(q, 10)
        rs, ri = oracle(q, feats, norms, 10)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        # scores: 1-ulp tolerance (rerank einsum vs oracle dot accumulate
        # in different orders; index order is certified regardless)
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(rs), rtol=0, atol=1e-6
        )

    def test_exclusions(self, rng):
        feats, norms, _ = make_data(rng, 5000)
        rows = rng.integers(0, 5000, 8).astype(np.int32)
        q = feats[rows]
        cr = CertifiedRetriever(feats, norms, interpret=True)
        s, i = cr(q, 10, exclude_rows=rows)
        rs, ri = oracle(q, feats, norms, 10, excl=rows)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        assert not np.any(np.asarray(i) == rows[:, None])

    def test_k_larger_than_prefilter(self, rng):
        feats, norms, q = make_data(rng, 3000, b=4)
        cr = CertifiedRetriever(
            feats, norms, RetrievalConfig(prefilter=8), interpret=True
        )
        s, i = cr(q, 50)  # k > prefilter: C clamps up to k
        _, ri = oracle(q, feats, norms, 50)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))

    def test_zero_norm_query_and_rows(self, rng):
        feats, norms, _ = make_data(rng, 2000)
        feats[7] = 0.0
        norms = np.linalg.norm(feats, axis=1).astype(np.float32)
        q = np.zeros((2, 12), np.float32)
        q[1] = feats[100]
        cr = CertifiedRetriever(feats, norms, interpret=True)
        s, i = cr(q, 5)
        rs, ri = oracle(q, feats, norms, 5)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(rs), rtol=0, atol=1e-6
        )


class TestAdversarial:
    def test_near_ties_within_eps_stay_exact(self, rng):
        """Catalog engineered so scores around the k-th boundary differ by
        less than BF16X2_EPS: certificates MUST fail (they cannot prove
        order), and the fallback must still deliver the oracle's answer."""
        n, f = 4000, 12
        base = rng.random(f).astype(np.float32) + 0.5
        feats = np.tile(base, (n, 1))
        # tiny per-row perturbations — exact scores tie to ~1e-7
        feats += (1e-7 * rng.standard_normal((n, f))).astype(np.float32)
        norms = np.linalg.norm(feats, axis=1).astype(np.float32)
        q = base[None, :].astype(np.float32)
        cr = CertifiedRetriever(feats, norms, interpret=True)
        s, i = cr(q, 10)
        rs, ri = oracle(q, feats, norms, 10)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(rs))
        assert cr.fallbacks >= 1  # the certificate must not bluff here

    def test_bin_collision_forces_fallback_stays_exact(self, rng):
        """Place 6 engineered top hits in ONE scan bin (same lane, same
        slice-parity): depth-3 tracking drops some, the v4 bound fails the
        certificate, and the fallback restores exactness."""
        n, f = 8192, 12
        feats = 0.01 * rng.random((n, f)).astype(np.float32) + 0.01
        target = rng.random(f).astype(np.float32) + 1.0
        cr_probe = CertifiedRetriever(feats, interpret=True)
        w = cr_probe.w
        # columns c, c+w, c+2w, ... share a bin (same lane, same window)
        hot = [13 + j * w for j in range(6)]
        for rank, col in enumerate(hot):
            feats[col] = target * (1.0 - 1e-4 * rank)
        norms = np.linalg.norm(feats, axis=1).astype(np.float32)
        q = target[None, :]
        cr = CertifiedRetriever(feats, norms, interpret=True)
        s, i = cr(q, 6)
        rs, ri = oracle(q, feats, norms, 6)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(rs))
        assert set(hot) == set(np.asarray(i)[0].tolist())
        assert cr.fallbacks >= 1

    def test_eps_bound_holds_empirically(self, rng):
        """|approx - exact| must stay below BF16X2_EPS (with margin) —
        the certificate's soundness rests on this bound."""
        n, f, b = 20000, 12, 64
        feats, norms, q = make_data(rng, n, f, b)
        unit = feats / norms[:, None]
        hi = unit.astype(jnp.bfloat16)
        lo = (unit - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        qu = q / qn
        qh = qu.astype(jnp.bfloat16)
        ql = (qu - np.asarray(qh, np.float32)).astype(jnp.bfloat16)
        approx = (
            np.asarray(qh, np.float32) @ np.asarray(hi, np.float32).T
            + np.asarray(qh, np.float32) @ np.asarray(lo, np.float32).T
            + np.asarray(ql, np.float32) @ np.asarray(hi, np.float32).T
            + np.asarray(ql, np.float32) @ np.asarray(lo, np.float32).T
        )
        approx = np.clip(approx, -1, 1)
        exact = np.clip(
            (q @ feats.T) / (qn * norms[None, :]), -1, 1
        )
        assert np.max(np.abs(approx - exact)) < BF16X2_EPS


class TestGuardSoundness:
    def test_tiny_nonzero_norm_row_anti_correlated_query(self, rng):
        """The v3 certificate's one RAISING case: a tiny-nonzero-norm row
        (qn*rn <= 1e-8) prenormalizes to a full unit vector whose raw
        cosine is -1, but the exact tier's guard pins its score to 0
        (reference Recommender.cu:67-72).  With every other score negative
        and well-separated, the plain coverage bound would certify a
        top-k that MISSES the guarded row — the guard-aware certificate
        must fail instead and the fallback must put the guarded row
        (exact score 0) first."""
        n, f = 4096, 12            # 4096 = one tile: no pad columns
        q = (rng.random(f).astype(np.float32) + 0.5)
        noise = 0.3 * rng.standard_normal((n, f)).astype(np.float32)
        feats = -q[None, :] + noise          # distinct negative cosines
        guarded = 3
        feats[guarded] = -q * np.float32(1e-12)   # rn ~ 1e-12: guarded
        norms = np.linalg.norm(feats, axis=1).astype(np.float32)
        assert 0 < norms[guarded] and norms[guarded] * np.linalg.norm(q) < 1e-8
        cr = CertifiedRetriever(feats, norms, interpret=True)
        s, i = cr(q[None, :], 3)
        rs, ri = oracle(q[None, :], feats, norms, 3)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(rs))
        # the guarded row's exact score 0 beats every negative cosine
        assert np.asarray(i)[0, 0] == guarded
        assert np.asarray(s)[0, 0] == 0.0
        assert cr.fallbacks >= 1   # the certificate must not bluff here

    def test_guard_aware_cert_no_false_fallback_on_positive(self, rng):
        """Tiny-norm rows present but every top score positive: s_k > 0
        proves guarded rows (exact 0) are out — the certificate should
        still PASS (no fallback storm on benign catalogs)."""
        feats, norms, q = make_data(rng, 4096, b=8)
        feats[11] *= np.float32(1e-12)       # one guardable row
        norms = np.linalg.norm(feats, axis=1).astype(np.float32)
        cr = CertifiedRetriever(feats, norms, interpret=True)
        s, i = cr(q, 10)
        rs, ri = oracle(q, feats, norms, 10)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        assert cr.fallbacks == 0


class TestNegativeCatalogs:
    """Learned-embedding regime (BASELINE's 64-dim config): standard-
    normal catalogs where scores are mostly NEGATIVE — v3's zero-scoring
    pad columns and epilogue-free scan must still deliver exactness."""

    @pytest.mark.parametrize("n", [5000, 8192])
    def test_standard_normal_embeddings_match_oracle(self, rng, n):
        f, b = 64, 16
        feats = rng.standard_normal((n, f)).astype(np.float32)
        norms = np.linalg.norm(feats, axis=1).astype(np.float32)
        q = rng.standard_normal((b, f)).astype(np.float32)
        cr = CertifiedRetriever(feats, norms, interpret=True)
        s, i = cr(q, 10)
        rs, ri = oracle(q, feats, norms, 10)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(rs), rtol=0, atol=1e-6
        )

    def test_all_negative_scores_with_exclusions_and_pads(self, rng):
        """Every real score negative + unaligned catalog (pad columns
        score 0 in the v3 scan and can displace real candidates) +
        self-exclusion: result must still equal the oracle."""
        n, f, b = 3333, 16, 8            # 3333: forces pad columns
        q = rng.random((b, f)).astype(np.float32) + 0.5
        feats = -(rng.random((n, f)).astype(np.float32) + 0.5)
        rows = rng.integers(0, n, b).astype(np.int32)
        feats[rows] = q                   # self rows positive -> excluded
        norms = np.linalg.norm(feats, axis=1).astype(np.float32)
        cr = CertifiedRetriever(feats, norms, interpret=True)
        s, i = cr(q, 10, exclude_rows=rows)
        rs, ri = oracle(q, feats, norms, 10, excl=rows)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        assert not np.any(np.asarray(i) == rows[:, None])
        # no pad column (>= n) or sentinel may leak into the results
        got = np.asarray(i)
        assert np.all((got >= 0) & (got < n))


class TestDepthCollision:
    def _collision_case(self, rng, config, n_hot, k):
        """Engineer `n_hot` top hits in ONE v3 bin (same lane, same
        slice-group) — one more than the configured depth can track, so
        the per-bin (depth+1)-th-best bound must fail the certificate and
        the fallback must restore exactness."""
        n, f = 8192, 12
        feats = 0.01 * rng.random((n, f)).astype(np.float32) + 0.01
        target = rng.random(f).astype(np.float32) + 1.0
        cr_probe = CertifiedRetriever(feats, config=config, interpret=True)
        w = cr_probe.w
        hot = [13 + j * w for j in range(n_hot)]
        for rank, col in enumerate(hot):
            feats[col] = target * (1.0 - 1e-4 * rank)
        norms = np.linalg.norm(feats, axis=1).astype(np.float32)
        q = target[None, :]
        cr = CertifiedRetriever(feats, norms, config, interpret=True)
        s, i = cr(q, k)
        rs, ri = oracle(q, feats, norms, k)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(rs))
        assert set(hot) == set(np.asarray(i)[0].tolist())
        assert cr.fallbacks >= 1

    def test_three_in_one_bin_depth2_forces_fallback(self, rng):
        self._collision_case(
            rng,
            RetrievalConfig(scan_depth=2, scan_escalate=0),
            n_hot=3, k=3,
        )

    def test_four_in_one_bin_depth3_forces_fallback(self, rng):
        self._collision_case(
            rng,
            RetrievalConfig(scan_depth=3, scan_escalate=0),
            n_hot=4, k=4,
        )

    def test_default_config_is_escalating_depth2(self):
        """Production default: depth-2 scan + depth-3 escalation (round-5
        sweep, docs/PERFORMANCE.md)."""
        cfg = RetrievalConfig()
        assert cfg.scan_depth == 2 and cfg.scan_escalate == 3

    def test_default_collision_past_escalation_forces_fallback(self, rng):
        # 4 hot in one bin beats BOTH the depth-2 base scan and the
        # depth-3 escalation: the oracle fallback must engage
        self._collision_case(rng, RetrievalConfig(), n_hot=4, k=4)


class TestTieSemantics:
    def test_duplicate_rows_lowest_index_wins(self, rng):
        """Exact duplicates score identically; the reference heap keeps
        the lowest catalog index (Recommender.cu:300-305)."""
        n = 3000
        feats = rng.random((n, 12), dtype=np.float32)
        feats[500] = feats[100]
        feats[2500] = feats[100]
        norms = np.linalg.norm(feats, axis=1).astype(np.float32)
        q = feats[100][None, :]
        cr = CertifiedRetriever(feats, norms, interpret=True)
        _, i = cr(q, 3)
        got = np.asarray(i)[0].tolist()
        assert got[0] == 100 and 500 in got and 2500 in got
        assert got.index(500) < got.index(2500)


class TestPlaneLayouts:
    def test_two_plane_matches_four_plane(self, rng):
        """split_planes=2 (half the HBM stream, two dots) must agree with
        the default 4-plane single-dot layout and the oracle."""
        feats, norms, q = make_data(rng, 6000, b=8)
        cr4 = CertifiedRetriever(feats, norms, interpret=True)
        cr2 = CertifiedRetriever(
            feats, norms, RetrievalConfig(split_planes=2), interpret=True
        )
        s4, i4 = cr4(q, 10)
        s2, i2 = cr2(q, 10)
        np.testing.assert_array_equal(np.asarray(i4), np.asarray(i2))
        rs, ri = oracle(q, feats, norms, 10)
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(ri))


class TestEscalation:
    """Depth-escalation rescan (RetrievalConfig.scan_escalate): shallow
    scan + in-jit deeper rescan of certificate failures, before any
    oracle fallback."""

    @staticmethod
    def _collision_catalog(rng, n, f, w, num_hot, gap):
        """Catalog whose top `num_hot` items all live in ONE scan bin
        (columns 13, 13+w, ...) with DISTINCT descending cosines
        (1, 1-gap, 1-2*gap, ...): perturbations are orthogonal to the
        query, so scores separate by ~gap — well past the gaps check —
        while everything else scores clearly lower."""
        feats = 0.01 * rng.random((n, f)).astype(np.float32) + 0.01
        target = rng.random(f).astype(np.float32) + 1.0
        v = rng.standard_normal(f).astype(np.float32)
        v -= (v @ target) / (target @ target) * target   # orthogonal
        v /= np.linalg.norm(v)
        tu = target / np.linalg.norm(target)
        hot = [13 + j * w for j in range(num_hot)]
        for rank, col in enumerate(hot):
            # cos = 1/sqrt(1+a^2) ~= 1 - rank*gap
            a = np.sqrt(max(2.0 * gap * rank, 0.0))
            feats[col] = tu + np.float32(a) * v
        norms = np.linalg.norm(feats, axis=1).astype(np.float32)
        return feats, norms, target[None, :], hot

    def test_bin_collision_resolved_by_escalation(self, rng):
        """4 engineered top hits in ONE bin: depth-2 tracking must fail,
        the depth-4 escalation rescan must certify them WITHOUT the
        oracle, and the result must still equal the oracle's."""
        n, f = 8192, 12
        cfg = RetrievalConfig(scan_depth=2, scan_escalate=4)
        w = CertifiedRetriever(
            np.ones((256, f), np.float32), None, cfg, interpret=True
        ).w
        feats, norms, q, hot = self._collision_catalog(
            rng, n, f, w, num_hot=4, gap=1e-3
        )
        cr = CertifiedRetriever(feats, norms, cfg, interpret=True)
        s, i = cr(q, 4)
        rs, ri = oracle(q, feats, norms, 4)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(rs))
        assert set(hot) == set(np.asarray(i)[0].tolist())
        assert cr.escalations >= 1       # the shallow pass had to escalate
        assert cr.fallbacks == 0         # ...and escalation was enough

    def test_escalation_still_exact_when_insufficient(self, rng):
        """Collisions too deep even for the escalated depth: the oracle
        fallback must still restore exactness."""
        n, f = 8192, 12
        cfg = RetrievalConfig(scan_depth=2, scan_escalate=3)
        w = CertifiedRetriever(
            np.ones((256, f), np.float32), None, cfg, interpret=True
        ).w
        feats, norms, q, hot = self._collision_catalog(
            rng, n, f, w, num_hot=6, gap=5e-4   # 6-deep > escalated 3
        )
        cr = CertifiedRetriever(feats, norms, cfg, interpret=True)
        s, i = cr(q, 6)
        rs, ri = oracle(q, feats, norms, 6)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(rs))
        assert cr.escalations >= 1
        assert cr.fallbacks >= 1         # escalation could not certify

    def test_random_batch_escalation_matches_oracle(self, rng):
        """Batched random workload through the escalating config equals
        the oracle row for row (certificates + splices compose)."""
        n, f, b = 20000, 12, 64
        feats = rng.random((n, f), dtype=np.float32)
        norms = np.linalg.norm(feats, axis=1).astype(np.float32)
        rows = rng.integers(0, n, size=b)
        q = feats[rows] + rng.normal(0, 0.01, (b, f)).astype(np.float32)
        cfg = RetrievalConfig(scan_depth=2, scan_escalate=3)
        cr = CertifiedRetriever(feats, norms, cfg, interpret=True)
        s, i = cr(q, 10, exclude_rows=rows)
        rs, ri = oracle(q, feats, norms, 10, excl=rows)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        # scores: 1-ulp tolerance on CPU (rerank vs oracle accumulate in
        # different orders; index order is certified regardless)
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(rs), rtol=0, atol=1e-6
        )


class TestSplitHelper:
    def test_split_bf16x2_faithful_in_interpret(self, rng):
        """The bf16x2 split helper must carry the remainder in the lo
        plane (residual ~2^-18, NOT ~2^-9).  The TPU-compiled twin of
        this test (test_tpu_compiled.py::TestSplitPlaneIntegrity) guards
        the XLA demotion rewrite this helper exists to defeat."""
        import jax
        import jax.numpy as jnp

        from spotify_recommender_tpu.ops.pallas.fused_topk import (
            _split_bf16x2,
        )

        x = rng.random((100, 12), dtype=np.float32) * 2.0 - 1.0
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)

        @jax.jit
        def prep(v):
            return _split_bf16x2(v, interpret=True)

        hi, lo = map(np.asarray, prep(jnp.asarray(xn)))
        res = np.abs(
            hi.astype(np.float32) + lo.astype(np.float32) - xn
        ).max()
        assert res < 1e-5, res

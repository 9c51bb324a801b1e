"""Fused Pallas score+top-k kernel vs the jnp oracle
(interpret mode on CPU; compiled path exercised on TPU by bench/CLI)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.ops.pallas.fused_topk import (
    FusedRetriever,
    fused_score_topk,
)
from spotify_recommender_tpu.ops.similarity import exact_topk


def random_features(n, d=12, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((n, d)).astype(np.float32)


def oracle(queries, feats, k, exclude=None):
    return exact_topk(
        jnp.asarray(queries),
        jnp.asarray(feats),
        exclude_rows=None if exclude is None else jnp.asarray(exclude),
        k=k,
    )


CFG = RetrievalConfig(query_tile=16, catalog_tile=128)


class TestFusedKernelInterpret:
    @pytest.mark.parametrize("n,b,k", [(500, 8, 10), (1000, 33, 7), (128, 5, 3)])
    def test_matches_oracle(self, n, b, k):
        feats = random_features(n, seed=n)
        queries = feats[:b]
        o_s, o_i = oracle(queries, feats, k)
        f_s, f_i = fused_score_topk(
            jnp.asarray(queries), feats, k=k, config=CFG, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(f_i), np.asarray(o_i))
        np.testing.assert_allclose(
            np.asarray(f_s), np.asarray(o_s), rtol=1e-6, atol=1e-7
        )

    def test_exclusion(self):
        feats = random_features(300, seed=1)
        b = 12
        excl = np.arange(b, dtype=np.int32)
        o_s, o_i = oracle(feats[:b], feats, 10, exclude=excl)
        f_s, f_i = fused_score_topk(
            jnp.asarray(feats[:b]), feats, k=10,
            exclude_rows=jnp.asarray(excl), config=CFG, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(f_i), np.asarray(o_i))
        rows = np.asarray(f_i)
        for i in range(b):
            assert i not in rows[i]

    def test_unaligned_catalog(self):
        # catalog size not a multiple of the tile: pad rows must never win
        feats = random_features(137, seed=2)
        o_s, o_i = oracle(feats[:4], feats, 10)
        f_s, f_i = fused_score_topk(
            jnp.asarray(feats[:4]), feats, k=10, config=CFG, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(f_i), np.asarray(o_i))
        assert np.asarray(f_i).max() < 137

    def test_zero_norm_rows_score_zero(self):
        # guard: denom <= 1e-8 -> score 0 (reference Recommender.cu:67-72).
        # With a negative query every real row scores < 0, so the zero-norm
        # row's guarded 0.0 must surface as the best hit.
        feats = random_features(200, seed=3) + 0.1
        feats[50] = 0.0
        q = -np.ones((2, 12), np.float32)
        f_s, f_i = fused_score_topk(
            jnp.asarray(q), feats, k=3, config=CFG, interpret=True
        )
        assert list(np.asarray(f_i)[:, 0]) == [50, 50]
        assert (np.asarray(f_s)[:, 0] == 0.0).all()

    def test_ties_prefer_lowest_index(self):
        feats = np.ones((64, 12), np.float32)
        f_s, f_i = fused_score_topk(
            jnp.asarray(feats[:1]), feats, k=5, config=CFG, interpret=True
        )
        assert list(np.asarray(f_i)[0]) == [0, 1, 2, 3, 4]

    def test_reused_retriever_multiple_batches(self):
        feats = random_features(400, seed=4)
        fr = FusedRetriever(feats, config=CFG, interpret=True)
        for b, seed in [(3, 0), (17, 1)]:
            rng = np.random.default_rng(seed)
            q = rng.random((b, 12)).astype(np.float32)
            o_s, o_i = oracle(q, feats, 10)
            f_s, f_i = fr(jnp.asarray(q), 10)
            np.testing.assert_array_equal(np.asarray(f_i), np.asarray(o_i))

    def test_multi_query_tiles(self):
        # B spans several query tiles (tq=16 -> 3 tiles)
        feats = random_features(256, seed=5)
        q = feats[:40]
        o_s, o_i = oracle(q, feats, 10)
        f_s, f_i = fused_score_topk(
            jnp.asarray(q), feats, k=10, config=CFG, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(f_i), np.asarray(o_i))


class TestFastMode:
    """exact_scores=False: pre-normalized fast path must match the oracle's
    ordering on real-ish data (mathematically identical cosine)."""

    def test_matches_oracle_ordering(self):
        feats = random_features(2000, seed=11)
        q = feats[:16]
        o_s, o_i = oracle(q, feats, 10)
        cfg = RetrievalConfig(query_tile=16, catalog_tile=128, exact_scores=False)
        f_s, f_i = fused_score_topk(
            jnp.asarray(q), feats, k=10, config=cfg, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(f_i), np.asarray(o_i))
        np.testing.assert_allclose(
            np.asarray(f_s), np.asarray(o_s), rtol=1e-5, atol=1e-6
        )

    def test_zero_norm_query_and_rows(self):
        feats = random_features(300, seed=12) + 0.1
        feats[50] = 0.0
        q = np.zeros((1, 12), np.float32)
        cfg = RetrievalConfig(query_tile=8, catalog_tile=128, exact_scores=False)
        f_s, f_i = fused_score_topk(
            jnp.asarray(q), feats, k=3, config=cfg, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(f_s)[0], np.zeros(3))


class TestShapeFuzz:
    """Randomized shapes/tilings vs the oracle (interpret mode)."""

    @pytest.mark.parametrize("seed", range(5))
    def test_random_shapes(self, seed):
        rng = np.random.default_rng(100 + seed)
        n = int(rng.integers(50, 700))
        b = int(rng.integers(1, 40))
        k = int(rng.integers(1, min(20, n)))
        tq = int(rng.choice([8, 16, 24, 48]))
        tc = int(rng.choice([128, 256, 384]))
        exact = bool(rng.integers(0, 2))
        feats = rng.random((n, 12), dtype=np.float32)
        q = rng.random((b, 12), dtype=np.float32)
        excl = rng.integers(-1, n, size=b).astype(np.int32)
        cfg = RetrievalConfig(query_tile=tq, catalog_tile=tc, exact_scores=exact)
        f_s, f_i = fused_score_topk(
            jnp.asarray(q), feats, k=k, exclude_rows=jnp.asarray(excl),
            config=cfg, interpret=True,
        )
        o_s, o_i = exact_topk(
            jnp.asarray(q), jnp.asarray(feats),
            exclude_rows=jnp.asarray(excl), k=k,
        )
        np.testing.assert_array_equal(np.asarray(f_i), np.asarray(o_i),
                                      err_msg=f"n={n} b={b} k={k} tq={tq} tc={tc} exact={exact}")


class TestBf16Mode:
    def test_bf16_requires_fast_mode(self):
        feats = random_features(100, seed=40)
        with pytest.raises(ValueError, match="bfloat16"):
            FusedRetriever(
                feats,
                config=RetrievalConfig(dtype="bfloat16", exact_scores=True),
            )

    def test_bf16_high_recall(self):
        feats = random_features(3000, seed=41)
        q = feats[:32]
        o_s, o_i = oracle(q, feats, 10)
        cfg = RetrievalConfig(
            query_tile=32, catalog_tile=256, dtype="bfloat16",
            exact_scores=False,
        )
        f_s, f_i = FusedRetriever(feats, config=cfg, interpret=True)(
            jnp.asarray(q), 10
        )
        # approximate tier: measure set-recall vs the exact oracle
        recall = np.mean([
            len(set(np.asarray(f_i)[b]) & set(np.asarray(o_i)[b])) / 10
            for b in range(32)
        ])
        assert recall > 0.9, recall
        # top-1 should essentially always survive bf16 error
        top1 = (np.asarray(f_i)[:, 0] == np.asarray(o_i)[:, 0]).mean()
        assert top1 > 0.9, top1


class TestPrefilterRerank:
    def test_near_exact_recall(self):
        from spotify_recommender_tpu.ops.pallas.fused_topk import (
            PrefilterRetriever,
        )

        feats = random_features(3000, seed=50)
        q = feats[:32]
        o_s, o_i = oracle(q, feats, 10)
        pr = PrefilterRetriever(
            feats,
            config=RetrievalConfig(query_tile=32, catalog_tile=256),
            prefilter=64,
            interpret=True,
        )
        f_s, f_i = pr(jnp.asarray(q), 10)
        recall = np.mean([
            len(set(np.asarray(f_i)[b]) & set(np.asarray(o_i)[b])) / 10
            for b in range(32)
        ])
        assert recall >= 0.99, recall
        # reranked scores are exact where indices agree
        agree = np.asarray(f_i) == np.asarray(o_i)
        np.testing.assert_allclose(
            np.asarray(f_s)[agree], np.asarray(o_s)[agree], rtol=1e-6
        )

    def test_exclusion_respected(self):
        from spotify_recommender_tpu.ops.pallas.fused_topk import (
            PrefilterRetriever,
        )

        feats = random_features(500, seed=51)
        excl = np.arange(8, dtype=np.int32)
        pr = PrefilterRetriever(
            feats,
            config=RetrievalConfig(query_tile=8, catalog_tile=128),
            prefilter=32,
            interpret=True,
        )
        _, rows = pr(jnp.asarray(feats[:8]), 10, jnp.asarray(excl))
        rows = np.asarray(rows)
        for b in range(8):
            assert b not in rows[b]


class TestApproxScanTier:
    """Round-5 approx tier: the v3 scan kernel without rerank/certificate
    (supersedes the bf16 tournament kernel — see BENCH_r04/r05)."""

    def test_high_recall_and_score_bound(self):
        from spotify_recommender_tpu.ops.pallas.fused_topk import (
            ApproxRetriever, BF16X2_EPS,
        )

        feats = random_features(5000, seed=50)
        q = feats[:64] + 0.01 * np.random.default_rng(50).standard_normal(
            (64, 12)
        ).astype(np.float32)
        o_s, o_i = oracle(q, feats, 10)
        ar = ApproxRetriever(feats, interpret=True)
        a_s, a_i = ar(jnp.asarray(q), 10)
        recall = np.mean([
            len(set(np.asarray(a_i)[b]) & set(np.asarray(o_i)[b])) / 10
            for b in range(64)
        ])
        # depth-2/W=128 bins: a miss needs 3 of the top-10 in ONE bin
        assert recall >= 0.99, recall
        # approx scores of agreeing items stay inside the proven bound
        for b in range(8):
            om = {int(i): float(s) for i, s in
                  zip(np.asarray(o_i)[b], np.asarray(o_s)[b])}
            for i, s in zip(np.asarray(a_i)[b], np.asarray(a_s)[b]):
                if int(i) in om:
                    assert abs(float(s) - om[int(i)]) < float(BF16X2_EPS)

    def test_exclusion_and_padding_masked(self):
        from spotify_recommender_tpu.ops.pallas.fused_topk import (
            ApproxRetriever,
        )

        n = 1000 + 37                      # unaligned: pad columns exist
        feats = random_features(n, seed=51)
        rows = np.arange(16, dtype=np.int32) * 7
        q = feats[rows]
        ar = ApproxRetriever(feats, interpret=True)
        _, a_i = ar(jnp.asarray(q), 10, exclude_rows=rows)
        ai = np.asarray(a_i)
        assert not np.any(ai == rows[:, None])     # self excluded
        assert np.all(ai >= 0) and np.all(ai < n)  # no pad leakage

    def test_large_k_raises_with_guidance(self):
        from spotify_recommender_tpu.ops.pallas.fused_topk import (
            ApproxRetriever,
        )

        feats = random_features(2000, seed=52)
        ar = ApproxRetriever(feats, interpret=True)
        with pytest.raises(ValueError, match="scan_bins"):
            ar(jnp.asarray(feats[:4]), 400)

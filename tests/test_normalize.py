"""Normalization parity tests (reference DataManager.cpp:270-301)."""

import numpy as np

from spotify_recommender_tpu.data.normalize import (
    build_feature_matrix,
    encode_genre_feature,
    feature_min_max,
    minmax_normalize,
)


class TestMinMax:
    def test_basic(self):
        raw = np.array([[0.0, 10.0], [1.0, 20.0], [0.5, 15.0]], np.float32)
        mn, mx = feature_min_max(raw)
        out = np.asarray(minmax_normalize(raw, mn, mx))
        np.testing.assert_allclose(out[:, 0], [0.0, 1.0, 0.5])
        np.testing.assert_allclose(out[:, 1], [0.0, 1.0, 0.5])

    def test_constant_feature_defaults_to_half(self):
        # range <= 1e-4 -> 0.5 (reference DataManager.cpp:292-295)
        raw = np.full((4, 1), 7.25, np.float32)
        mn, mx = feature_min_max(raw)
        out = np.asarray(minmax_normalize(raw, mn, mx))
        np.testing.assert_array_equal(out, np.full((4, 1), 0.5, np.float32))

    def test_range_floor_is_strict(self):
        # range exactly 1e-4 is NOT > 1e-4 -> constant rule applies
        raw = np.array([[0.0], [1e-4]], np.float32)
        mn, mx = feature_min_max(raw)
        out = np.asarray(minmax_normalize(raw, mn, mx))
        np.testing.assert_array_equal(out, np.full((2, 1), 0.5, np.float32))

    def test_fp32_faithful_vs_numpy(self):
        rng = np.random.default_rng(0)
        raw = rng.standard_normal((100, 11)).astype(np.float32) * 50
        mn = raw.min(axis=0)
        mx = raw.max(axis=0)
        expected = (raw - mn) / (mx - mn)  # numpy fp32 == C fp32 here
        out = np.asarray(minmax_normalize(raw, mn, mx))
        # XLA may lower fp32 division via reciprocal-multiply: 1-ulp slack.
        np.testing.assert_allclose(out, expected.astype(np.float32), atol=6e-8)


class TestGenreFeature:
    def test_scaling(self):
        # id / max(1, G-1) (reference DataManager.cpp:299)
        gids = np.array([0, 1, 2, 3], np.int32)
        out = np.asarray(encode_genre_feature(gids, 4))
        np.testing.assert_allclose(out, [0.0, 1 / 3, 2 / 3, 1.0], rtol=1e-6)

    def test_single_genre_divides_by_one(self):
        gids = np.array([0, 0], np.int32)
        out = np.asarray(encode_genre_feature(gids, 1))
        np.testing.assert_array_equal(out, [0.0, 0.0])


class TestBuildFeatureMatrix:
    def test_shapes_and_genre_column(self):
        rng = np.random.default_rng(1)
        raw = rng.random((10, 11)).astype(np.float32)
        gids = np.arange(10, dtype=np.int32) % 3
        feats, mn, mx = build_feature_matrix(raw, gids, 3)
        assert feats.shape == (10, 12)
        assert feats.dtype == np.float32
        np.testing.assert_allclose(
            feats[:, 11], gids.astype(np.float32) / 2.0, rtol=1e-6
        )
        assert mn.shape == (11,)

    def test_empty(self):
        feats, mn, mx = build_feature_matrix(
            np.zeros((0, 11), np.float32), np.zeros(0, np.int32), 0
        )
        assert feats.shape == (0, 12)

"""Catalog artifact round-trip + legacy binary interop
(reference DataManager.cpp:315-409, Song.h:35-77 format)."""

import numpy as np
import pytest

from spotify_recommender_tpu.data.catalog import (
    Catalog,
    from_raw_table,
    preprocess_csv,
)
from spotify_recommender_tpu.data.csv_ingest import ingest_csv


@pytest.fixture
def catalog(songs_csv):
    return from_raw_table(ingest_csv(str(songs_csv), use_native=False))


class TestNpzRoundTrip:
    def test_round_trip(self, catalog, tmp_path):
        path = str(tmp_path / "cat.npz")
        catalog.save(path)
        loaded = Catalog.load(path)
        np.testing.assert_array_equal(loaded.features, catalog.features)
        np.testing.assert_array_equal(loaded.norms, catalog.norms)
        assert list(loaded.track_ids) == list(catalog.track_ids)
        assert list(loaded.track_names) == list(catalog.track_names)
        assert list(loaded.artists) == list(catalog.artists)
        assert loaded.genre_names == catalog.genre_names
        np.testing.assert_array_equal(loaded.genre_ids, catalog.genre_ids)

    def test_norms_precomputed(self, catalog):
        np.testing.assert_allclose(
            catalog.norms,
            np.linalg.norm(catalog.features, axis=1),
            rtol=1e-6,
        )


class TestLegacyBinaryInterop:
    def test_round_trip(self, catalog, tmp_path):
        path = str(tmp_path / "songs_data.bin")
        catalog.save_reference_binary(path)
        loaded = Catalog.load_reference_binary(path)
        np.testing.assert_array_equal(loaded.features, catalog.features)
        assert list(loaded.track_ids) == list(catalog.track_ids)
        assert loaded.genre_names == catalog.genre_names

    def test_unicode_strings(self, tmp_path):
        cat = Catalog(
            features=np.eye(2, 12, dtype=np.float32),
            norms=None,
            track_ids=np.asarray(["idé", "id2"], dtype=object),
            track_names=np.asarray(["Träck — ☆", "B"], dtype=object),
            artists=np.asarray(["Ärtist", "X"], dtype=object),
            genre_ids=np.asarray([0, 0], np.int32),
            genre_names=["žánr"],
            min_vals=np.zeros(11, np.float32),
            max_vals=np.ones(11, np.float32),
        )
        path = str(tmp_path / "u.bin")
        cat.save_reference_binary(path)
        loaded = Catalog.load_reference_binary(path)
        assert loaded.track_names[0] == "Träck — ☆"
        assert loaded.genre_names == ["žánr"]


class TestPreprocessEndToEnd:
    def test_preprocess_csv(self, songs_csv, tmp_path):
        out = str(tmp_path / "cat.npz")
        cat = preprocess_csv(str(songs_csv), out)
        assert len(cat) == 200
        loaded = Catalog.load(out)
        assert len(loaded) == 200
        # all features within [0, 1] after min-max + genre encoding
        assert float(loaded.features.min()) >= 0.0
        assert float(loaded.features.max()) <= 1.0


class TestValidation:
    def test_corrupt_genre_id_rejected(self, catalog, tmp_path):
        import copy

        bad = copy.deepcopy(catalog)
        bad.genre_ids = bad.genre_ids.copy()
        bad.genre_ids[0] = 999
        with pytest.raises(ValueError, match="out of range"):
            bad.validate()

    def test_nan_features_rejected(self, catalog):
        import copy

        bad = copy.deepcopy(catalog)
        bad.features = bad.features.copy()
        bad.features[0, 0] = np.nan
        with pytest.raises(ValueError, match="non-finite"):
            bad.validate()

    def test_length_mismatch_rejected(self, catalog):
        import copy

        bad = copy.deepcopy(catalog)
        bad.norms = bad.norms[:-1]
        with pytest.raises(ValueError, match="norms"):
            bad.validate()

    def test_good_catalog_passes(self, catalog):
        catalog.validate()


class TestCorruptFiles:
    def test_truncated_npz_fails_cleanly(self, catalog, tmp_path):
        path = str(tmp_path / "t.npz")
        catalog.save(path)
        data = open(path, "rb").read()
        open(path, "wb").write(data[: len(data) // 2])
        with pytest.raises(Exception):
            Catalog.load(path)

    def test_not_a_catalog_npz(self, tmp_path):
        path = str(tmp_path / "x.npz")
        np.savez(path, something=np.arange(3))
        with pytest.raises(KeyError):
            Catalog.load(path)

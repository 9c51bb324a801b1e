"""Streaming (bounded-RAM) preprocessing + memory-mapped catalog format."""

import numpy as np
import pytest

from conftest import make_songs_csv
from spotify_recommender_tpu.data.catalog import Catalog, preprocess_csv
from spotify_recommender_tpu.data.streaming import (
    iter_csv_chunks,
    preprocess_csv_streaming,
)


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    return str(
        make_songs_csv(
            tmp_path_factory.mktemp("stream") / "songs.csv",
            n_rows=500, n_genres=7, seed=3,
        )
    )


class TestChunkIterator:
    def test_chunks_cover_all_lines(self, csv_path):
        total = 0
        headers = set()
        for header, lines in iter_csv_chunks(csv_path, 64):
            headers.add(header)
            total += len(lines)
            assert len(lines) <= 64
        assert len(headers) == 1
        with open(csv_path) as f:
            want = sum(1 for _ in f) - 1
        assert total == want

    def test_empty_csv_raises(self, tmp_path):
        p = tmp_path / "empty.csv"
        p.write_text("")
        with pytest.raises(ValueError):
            list(iter_csv_chunks(str(p), 10))


class TestStreamingParity:
    """Streamed chunked preprocessing must be bit-identical to the
    single-shot pipeline: same rows, ids, genre order, features, norms."""

    @pytest.mark.parametrize("chunk_rows", [32, 200, 10_000])
    def test_matches_single_shot(self, csv_path, tmp_path, chunk_rows):
        ref = preprocess_csv(csv_path)
        out = str(tmp_path / f"cat_{chunk_rows}")
        cat = preprocess_csv_streaming(
            csv_path, out, chunk_rows=chunk_rows, use_native=False
        )
        assert len(cat) == len(ref)
        assert cat.genre_names == ref.genre_names
        np.testing.assert_array_equal(cat.genre_ids, ref.genre_ids)
        np.testing.assert_array_equal(cat.features, ref.features)
        np.testing.assert_array_equal(cat.norms, ref.norms)
        assert [str(x) for x in cat.track_ids] == [
            str(x) for x in ref.track_ids
        ]
        np.testing.assert_array_equal(cat.min_vals, ref.min_vals)
        np.testing.assert_array_equal(cat.max_vals, ref.max_vals)

    def test_native_matches_python(self, csv_path, tmp_path):
        from spotify_recommender_tpu.data import native_ingest

        if not native_ingest.available():
            pytest.skip("native parser not built")
        a = preprocess_csv_streaming(
            csv_path, str(tmp_path / "nat"), chunk_rows=100, use_native=True
        )
        b = preprocess_csv_streaming(
            csv_path, str(tmp_path / "py"), chunk_rows=100, use_native=False
        )
        np.testing.assert_array_equal(a.features, b.features)
        assert a.genre_names == b.genre_names


class TestMemmapFormat:
    def test_load_is_memory_mapped(self, csv_path, tmp_path):
        out = str(tmp_path / "mm")
        preprocess_csv_streaming(csv_path, out, chunk_rows=128,
                                 use_native=False)
        cat = Catalog.load(out)  # dispatches on isdir
        assert isinstance(cat.features, np.memmap)
        assert isinstance(cat.norms, np.memmap)
        # mmap arrays are read-only pages, untouched by __post_init__
        assert not cat.features.flags.writeable

    def test_roundtrip_save_dir(self, csv_path, tmp_path):
        ref = preprocess_csv(csv_path)
        out = str(tmp_path / "dir")
        ref.save_dir(out)
        cat = Catalog.load_dir(out)
        np.testing.assert_array_equal(cat.features, ref.features)
        assert cat.genre_names == ref.genre_names
        assert str(cat.track_names[3]) == str(ref.track_names[3])

    def test_retriever_runs_on_memmap_catalog(self, csv_path, tmp_path):
        from spotify_recommender_tpu.core.config import RetrievalConfig
        from spotify_recommender_tpu.retrieval.retriever import Retriever

        out = str(tmp_path / "serveable")
        cat = preprocess_csv_streaming(csv_path, out, chunk_rows=128,
                                       use_native=False)
        r = Retriever(cat, RetrievalConfig(use_pallas=False))
        recs = r.recommend_by_index(5, 4)
        assert len(recs) == 4
        ref = Retriever(preprocess_csv(csv_path),
                        RetrievalConfig(use_pallas=False))
        want = ref.recommend_by_index(5, 4)
        assert [x.row for x in recs] == [x.row for x in want]

    def test_corrupt_dir_rejected(self, csv_path, tmp_path):
        out = str(tmp_path / "bad")
        preprocess_csv_streaming(csv_path, out, chunk_rows=128,
                                 use_native=False)
        feats = np.load(out + "/features.npy", mmap_mode="r+")
        feats[0, 0] = np.nan
        feats.flush()
        del feats
        with pytest.raises(ValueError, match="non-finite"):
            Catalog.load_dir(out)

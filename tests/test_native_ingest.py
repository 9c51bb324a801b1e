"""Native C++ CSV parser vs the Python behavioral oracle.

Every edge case the Python path handles (tests/test_csv.py) must produce
identical output from the native path."""

import numpy as np
import pytest

from spotify_recommender_tpu.data import native_ingest
from spotify_recommender_tpu.data.csv_ingest import parse_csv_rows

pytestmark = pytest.mark.skipif(
    not native_ingest.available(), reason="native parser not built"
)

HEADER = (
    "track_id,track_name,artists,danceability,energy,key,loudness,mode,"
    "speechiness,acousticness,instrumentalness,liveness,valence,tempo,"
    "track_genre"
)


def both(header, lines):
    py = parse_csv_rows(header, lines)
    nat = native_ingest.parse_csv_rows_native(header, lines)
    return py, nat


def assert_tables_equal(py, nat):
    assert nat.num_valid_rows == py.num_valid_rows
    assert nat.num_input_rows == py.num_input_rows
    assert list(nat.track_ids) == list(py.track_ids)
    assert list(nat.track_names) == list(py.track_names)
    assert list(nat.artists) == list(py.artists)
    assert nat.genre_names == py.genre_names
    np.testing.assert_array_equal(nat.genre_ids, py.genre_ids)
    np.testing.assert_array_equal(nat.raw_features, py.raw_features)


ROW = "t1,Song A,Artist,0.5,0.6,C,-5.0,Major,0.1,0.2,0.3,0.4,0.5,120.0,rock"


class TestNativeParity:
    def test_happy_path(self):
        assert_tables_equal(*both(HEADER, [ROW]))

    def test_edge_cases(self):
        lines = [
            ROW,
            'q1,"Song, with comma","A, B",0.1,0.2,Db,-3,minor,0,0,0,0,0,99,pop',
            "short,row",
            ",NoId,A,0.1,0.2,0,0,1,0,0,0,0,0,99,pop",          # empty id
            "t2,,A,0.1,0.2,0,0,1,0,0,0,0,0,99,pop",            # empty name
            "t3,N,A,xx,0.2,0,0,1,0,0,0,0,0,99,pop",            # bad number
            "t4,N,A,0.1,0.2,H,0,1,0,0,0,0,0,99,pop",           # bad key
            "t5,N,A,0.1,0.2,5,0,maybe,0,0,0,0,0,99,pop",       # bad mode
            "t6,N,A,0.1,0.2,5,0,1,0,0,0,0,0,99,",              # empty genre
            "t7,N,A,1e-3,0.2,Bb,-0.5,0,0,0,0,0,0,99.5,zz-genre",
            "t8,N,A,0x10,0.2,11,-0.5,0,0,0,0,0,0,99.5,rock",   # hex strtod
        ]
        assert_tables_equal(*both(HEADER, lines))

    def test_bom_and_crlf(self):
        py, nat = both("﻿" + HEADER, [ROW + "\r", "\r", ROW.replace("t1", "t2")])
        assert_tables_equal(py, nat)

    def test_genre_order_deterministic(self):
        lines = [
            ROW.replace("rock", "z-genre"),
            ROW.replace("t1", "t2").replace("rock", "a-genre"),
            ROW.replace("t1", "t3").replace("rock", "z-genre"),
        ]
        py, nat = both(HEADER, lines)
        assert nat.genre_names == ["z-genre", "a-genre"]
        assert_tables_equal(py, nat)

    def test_missing_column_raises(self):
        with pytest.raises(ValueError, match="track_genre"):
            native_ingest.parse_csv_rows_native(
                HEADER.replace(",track_genre", ",x"), [ROW]
            )

    def test_large_random_matches(self, tmp_path):
        from conftest import make_songs_csv

        p = make_songs_csv(tmp_path / "big.csv", n_rows=5000, n_genres=20)
        text = p.read_text(encoding="utf-8").splitlines()
        py, nat = both(text[0], text[1:])
        assert_tables_equal(py, nat)
        assert nat.num_valid_rows == 5000

    def test_unicode(self):
        lines = [ROW.replace("Song A", "Chanson être ☆").replace("rock", "žánr")]
        py, nat = both(HEADER, lines)
        assert_tables_equal(py, nat)
        assert nat.track_names[0] == "Chanson être ☆"


class TestThreadDeterminism:
    def test_genre_ids_invariant_across_thread_counts(self, tmp_path):
        # the reference's genre ids depend on OpenMP interleaving
        # (DataManager.cpp:244-251); ours must not depend on thread count
        from conftest import make_songs_csv

        p = make_songs_csv(tmp_path / "d.csv", n_rows=3000, n_genres=30, seed=9)
        data = p.read_bytes()
        t1 = native_ingest.parse_csv_buffer(data, num_threads=1)
        t8 = native_ingest.parse_csv_buffer(data, num_threads=8)
        assert t1.genre_names == t8.genre_names
        np.testing.assert_array_equal(t1.genre_ids, t8.genre_ids)
        np.testing.assert_array_equal(t1.raw_features, t8.raw_features)


def test_messy_csv_native_matches_python(tmp_path):
    """Native tokenizer vs the Python oracle on the full messy fixture
    (quotes/unicode/CRLF/control chars/bad numerics — see conftest)."""
    from conftest import make_messy_songs_csv
    from spotify_recommender_tpu.data import csv_ingest, native_ingest

    if not native_ingest.available():
        pytest.skip("native parser not built")
    path, n_expected = make_messy_songs_csv(tmp_path / "m.csv", n_clean=500)
    data = path.read_bytes()
    nat = native_ingest.parse_csv_buffer(data)
    text = data.decode("utf-8")
    nl = text.find("\n")
    py = csv_ingest.parse_csv_rows(text[:nl], text[nl + 1 :].split("\n"))
    assert nat.num_valid_rows == py.num_valid_rows == n_expected
    assert list(nat.track_ids) == list(py.track_ids)
    assert list(nat.track_names) == list(py.track_names)
    assert list(nat.artists) == list(py.artists)
    assert nat.genre_names == py.genre_names
    np.testing.assert_array_equal(nat.genre_ids, py.genre_ids)
    np.testing.assert_array_equal(nat.raw_features, py.raw_features)

"""CSV parsing + validation edge cases
(reference DataManager.cpp:72-92 tokenizer, :164-253 validation)."""

import numpy as np
import pytest

from spotify_recommender_tpu.data.csv_ingest import (
    parse_csv_line,
    parse_csv_rows,
    strip_bom,
    ingest_csv,
)

HEADER = (
    "track_id,track_name,artists,danceability,energy,key,loudness,mode,"
    "speechiness,acousticness,instrumentalness,liveness,valence,tempo,"
    "track_genre"
)


def row(
    tid="t1",
    name="Song",
    artists="Artist",
    dance="0.5",
    energy="0.6",
    key="C",
    loud="-5.0",
    mode="Major",
    speech="0.1",
    acoustic="0.2",
    instr="0.3",
    live="0.4",
    valence="0.5",
    tempo="120.0",
    genre="rock",
):
    return ",".join(
        [tid, name, artists, dance, energy, key, loud, mode, speech,
         acoustic, instr, live, valence, tempo, genre]
    )


class TestTokenizer:
    def test_plain_split_and_trim(self):
        assert parse_csv_line("a, b ,c\r") == ["a", "b", "c"]

    def test_quoted_commas(self):
        # quotes toggle and are dropped (reference DataManager.cpp:80-82)
        assert parse_csv_line('x,"a, b",y') == ["x", "a, b", "y"]

    def test_quote_chars_removed_everywhere(self):
        assert parse_csv_line('"a"b"c,d"') == ["abc,d"]

    def test_empty_fields(self):
        assert parse_csv_line(",,") == ["", "", ""]

    def test_bom(self):
        assert strip_bom("﻿track_id") == "track_id"
        assert strip_bom("track_id") == "track_id"


class TestValidation:
    def test_happy_path(self):
        t = parse_csv_rows(HEADER, [row()])
        assert t.num_valid_rows == 1
        assert t.track_ids[0] == "t1"
        # key C -> 0, mode Major -> 1 (reference DataManager.cpp:25-54)
        np.testing.assert_allclose(t.raw_features[0, 2], 0.0)
        np.testing.assert_allclose(t.raw_features[0, 4], 1.0)

    def test_short_row_skipped(self):
        t = parse_csv_rows(HEADER, ["a,b,c", row()])
        assert t.num_valid_rows == 1

    def test_empty_id_or_name_skipped(self):
        t = parse_csv_rows(HEADER, [row(tid=""), row(name=""), row(tid="t3")])
        assert t.num_valid_rows == 1
        assert t.track_ids[0] == "t3"

    def test_invalid_number_skipped(self):
        t = parse_csv_rows(HEADER, [row(dance="abc"), row(tempo="12x"), row()])
        assert t.num_valid_rows == 1

    def test_numeric_key_and_mode_accepted(self):
        t = parse_csv_rows(HEADER, [row(key="7", mode="0.0")])
        assert t.num_valid_rows == 1
        assert t.raw_features[0, 2] == 7.0
        assert t.raw_features[0, 4] == 0.0

    def test_invalid_key_and_mode_skipped(self):
        t = parse_csv_rows(HEADER, [row(key="H"), row(mode="dorian")])
        assert t.num_valid_rows == 0

    def test_empty_genre_skipped(self):
        t = parse_csv_rows(HEADER, [row(genre="")])
        assert t.num_valid_rows == 0

    def test_genre_first_appearance_order(self):
        t = parse_csv_rows(
            HEADER,
            [row(tid="a", genre="z-genre"), row(tid="b", genre="a-genre"),
             row(tid="c", genre="z-genre")],
        )
        assert t.genre_names == ["z-genre", "a-genre"]
        assert list(t.genre_ids) == [0, 1, 0]

    def test_missing_required_column_raises(self):
        with pytest.raises(ValueError, match="track_genre"):
            parse_csv_rows(HEADER.replace(",track_genre", ",other"), [row()])

    def test_extra_columns_ok(self):
        t = parse_csv_rows(HEADER + ",album", [row() + ",Some Album"])
        assert t.num_valid_rows == 1

    def test_quoted_artist_with_comma(self):
        t = parse_csv_rows(HEADER, [row(artists='"Guns, Roses"')])
        assert t.artists[0] == "Guns, Roses"


class TestIngestFile(object):
    def test_ingest_with_bom_and_blank_lines(self, tmp_path):
        p = tmp_path / "x.csv"
        p.write_text(
            "﻿" + HEADER + "\n" + row() + "\n\n" + row(tid="t2") + "\n",
            encoding="utf-8",
        )
        t = ingest_csv(str(p), use_native=False)
        assert t.num_valid_rows == 2

    def test_synthetic_fixture(self, songs_csv):
        t = ingest_csv(str(songs_csv), use_native=False)
        assert t.num_valid_rows == 200
        assert len(t.genre_names) == 5

"""Unit tests for the feature schema encodings
(reference DataManager.cpp:25-69 behavior)."""

import math

import pytest

from spotify_recommender_tpu.data.schema import (
    key_to_number,
    mode_to_number,
    parse_number,
)


class TestKeyToNumber:
    @pytest.mark.parametrize(
        "key,expected",
        [
            ("C", 0), ("c", 0),
            ("C#", 1), ("Db", 1), ("DB", 1), ("db", 1),
            ("D", 2), ("D#", 3), ("Eb", 3),
            ("E", 4), ("F", 5), ("F#", 6), ("Gb", 6),
            ("G", 7), ("G#", 8), ("Ab", 8),
            ("A", 9), ("A#", 10), ("Bb", 10), ("B", 11),
        ],
    )
    def test_symbolic(self, key, expected):
        assert key_to_number(key) == expected

    @pytest.mark.parametrize("key", ["H", "", "5", "C##", "do"])
    def test_invalid(self, key):
        assert key_to_number(key) == -1


class TestModeToNumber:
    @pytest.mark.parametrize(
        "mode,expected",
        [("Major", 1), ("major", 1), ("MAJOR", 1), ("1", 1),
         ("Minor", 0), ("minor", 0), ("0", 0)],
    )
    def test_valid(self, mode, expected):
        assert mode_to_number(mode) == expected

    @pytest.mark.parametrize("mode", ["", "2", "maj", "dorian"])
    def test_invalid(self, mode):
        assert mode_to_number(mode) == -1


class TestParseNumber:
    def test_plain(self):
        assert parse_number("0.5") == 0.5
        assert parse_number("-12.25") == -12.25
        assert parse_number("3") == 3.0

    def test_scientific(self):
        assert parse_number("1e-3") == 1e-3
        assert parse_number("2.5E2") == 250.0

    def test_hex_like_strtod(self):
        # strtod parses C99 hex floats; the reference would accept these
        assert parse_number("0x10") == 16.0
        assert parse_number("-0x2") == -2.0

    def test_inf_nan(self):
        assert parse_number("inf") == math.inf
        assert math.isnan(parse_number("nan"))

    @pytest.mark.parametrize("s", ["", "abc", "1.5x", "1,5", "1 2", "1_0", " 1"])
    def test_rejects_partial_parse(self, s):
        # strtod full-consumption check (reference DataManager.cpp:64-69)
        assert parse_number(s) is None

"""End-to-end CLI tests (reference main.cpp:13-31 usage surface)."""

import os

import pytest

from spotify_recommender_tpu import cli


@pytest.fixture
def workdir(tmp_path, songs_csv, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


class TestReferenceStyleFlags:
    def test_preprocess_then_recommend_by_song(self, workdir, songs_csv, capsys):
        assert cli.main(["--preprocess", str(songs_csv)]) == 0
        out = capsys.readouterr().out
        assert "Valid songs: 200" in out
        assert os.path.exists(cli.DEFAULT_CATALOG)

        assert cli.main(["--song", "Song 42", "-n", "5"]) == 0
        out = capsys.readouterr().out
        assert "Query Song:" in out
        assert "Top 5 Recommendations:" in out

    def test_recommend_by_id(self, workdir, songs_csv, capsys):
        cli.main(["--preprocess", str(songs_csv)])
        capsys.readouterr()
        assert cli.main(["--id", "id00003"]) == 0
        out = capsys.readouterr().out
        assert "Top 10 Recommendations:" in out
        assert "id00003" in out  # query card shows the id

    def test_invalid_n_rejected(self, workdir, songs_csv, capsys):
        cli.main(["--preprocess", str(songs_csv)])
        capsys.readouterr()
        assert cli.main(["--song", "Song 1", "-n", "-3"]) == 1

    def test_missing_song_errors(self, workdir, songs_csv, capsys):
        cli.main(["--preprocess", str(songs_csv)])
        capsys.readouterr()
        assert cli.main(["--song", "zzz-not-there"]) == 1

    def test_preprocess_missing_arg(self, capsys):
        assert cli.main(["--preprocess"]) == 1


class TestSubcommands:
    def test_preprocess_subcommand(self, workdir, songs_csv, capsys):
        out_path = str(workdir / "custom.npz")
        assert cli.main(["preprocess", str(songs_csv), "-o", out_path]) == 0
        assert os.path.exists(out_path)

        assert (
            cli.main(
                ["recommend", "--song", "Song 7", "-n", "3", "--catalog", out_path]
            )
            == 0
        )
        out = capsys.readouterr().out
        assert "Top 3 Recommendations:" in out

    def test_no_command_shows_help(self, capsys):
        assert cli.main([]) == 1

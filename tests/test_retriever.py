"""Retriever API semantics (reference Recommender.h:28-130 surface)."""

import numpy as np
import pytest

from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.data.catalog import Catalog, from_raw_table
from spotify_recommender_tpu.data.csv_ingest import ingest_csv
from spotify_recommender_tpu.retrieval.retriever import Retriever

from conftest import reference_cpu_similarities, reference_topk


@pytest.fixture(scope="module")
def catalog(tmp_path_factory):
    from conftest import make_songs_csv

    p = make_songs_csv(tmp_path_factory.mktemp("data") / "songs.csv", n_rows=300)
    return from_raw_table(ingest_csv(str(p), use_native=False))


@pytest.fixture(scope="module")
def retriever(catalog):
    return Retriever(catalog, RetrievalConfig(use_pallas=False))


class TestLookupSemantics:
    def test_by_id(self, retriever):
        recs = retriever.recommend_by_id("id00007", k=5)
        assert len(recs) == 5
        assert all(r.track_id != "id00007" for r in recs)

    def test_by_id_missing(self, retriever):
        with pytest.raises(KeyError):
            retriever.recommend_by_id("nope")

    def test_by_name_exact_case_insensitive(self, retriever):
        recs = retriever.recommend_by_name("song 12", k=3)
        assert len(recs) == 3
        assert all(r.track_name != "Song 12" for r in recs)

    def test_by_name_substring_fallback(self, retriever):
        # exact fails, substring picks the lowest matching row
        # (reference Recommender.cu:347-352): "ong 12" matches "Song 12" first
        recs = retriever.recommend_by_name("ong 12", k=2)
        assert len(recs) == 2

    def test_by_name_missing(self, retriever):
        with pytest.raises(KeyError):
            retriever.recommend_by_name("zzz-no-such-song")

    def test_invalid_index(self, retriever):
        with pytest.raises(IndexError):
            retriever.recommend_by_index(-1)
        with pytest.raises(IndexError):
            retriever.recommend_by_index(10_000)


class TestRankingParity:
    def test_matches_reference_math(self, catalog, retriever):
        for qi in [0, 50, 299]:
            recs = retriever.recommend_by_index(qi, k=10)
            sims = reference_cpu_similarities(
                catalog.features[qi], catalog.features
            )
            expected = reference_topk(sims, qi, 10)
            assert [r.row for r in recs] == expected

    def test_scores_descending(self, retriever):
        recs = retriever.recommend_by_index(3, k=20)
        scores = [r.score for r in recs]
        assert scores == sorted(scores, reverse=True)

    def test_k_clamped_to_catalog(self, catalog):
        small = Catalog(
            features=catalog.features[:5],
            norms=catalog.norms[:5],
            track_ids=catalog.track_ids[:5],
            track_names=catalog.track_names[:5],
            artists=catalog.artists[:5],
            genre_ids=catalog.genre_ids[:5],
            genre_names=catalog.genre_names,
            min_vals=catalog.min_vals,
            max_vals=catalog.max_vals,
        )
        r = Retriever(small, RetrievalConfig(use_pallas=False))
        recs = r.recommend_by_index(0, k=100)
        assert len(recs) == 4  # N-1: everything except the query

    def test_batched_retrieve(self, catalog, retriever):
        queries = catalog.features[:16]
        scores, rows = retriever.retrieve(queries, k=10)
        assert scores.shape == (16, 10)
        assert rows.shape == (16, 10)
        # row 0 of each result is the query itself (no exclusion)
        np.testing.assert_array_equal(np.asarray(rows)[:, 0], np.arange(16))

    def test_empty_catalog_rejected(self, catalog):
        empty = Catalog(
            features=np.zeros((0, 12), np.float32),
            norms=np.zeros(0, np.float32),
            track_ids=np.asarray([], dtype=object),
            track_names=np.asarray([], dtype=object),
            artists=np.asarray([], dtype=object),
            genre_ids=np.zeros(0, np.int32),
            genre_names=[],
            min_vals=np.zeros(11, np.float32),
            max_vals=np.ones(11, np.float32),
        )
        with pytest.raises(ValueError):
            Retriever(empty)

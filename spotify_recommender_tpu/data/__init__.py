from spotify_recommender_tpu.data.schema import (
    FEATURE_COLUMNS,
    REQUIRED_COLUMNS,
    key_to_number,
    mode_to_number,
)
from spotify_recommender_tpu.data.csv_ingest import parse_csv_rows, ingest_csv
from spotify_recommender_tpu.data.normalize import minmax_normalize, encode_genre_feature
from spotify_recommender_tpu.data.catalog import Catalog, preprocess_csv

__all__ = [
    "FEATURE_COLUMNS",
    "REQUIRED_COLUMNS",
    "key_to_number",
    "mode_to_number",
    "parse_csv_rows",
    "ingest_csv",
    "minmax_normalize",
    "encode_genre_feature",
    "Catalog",
    "preprocess_csv",
]

"""Test config: force an 8-device virtual CPU mesh (the standard JAX
substitute for multi-chip hardware — SURVEY.md §4) before jax imports.

Set SRT_TPU_TESTS=1 to run against the real TPU instead (enables the
compiled-Mosaic parity tests in test_tpu_compiled.py; everything else
still passes, just slower to compile)."""

import os

_USE_TPU = os.environ.get("SRT_TPU_TESTS") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not _USE_TPU:
    # Force CPU with 8 virtual devices: the shell presets JAX_PLATFORMS=axon
    # (the TPU tunnel) and its plugin re-registers itself over the env var,
    # so the config must be set programmatically before first device use.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

# Persistent compilation cache: jit compiles dominate suite runtime on the
# virtual 8-device CPU mesh; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def make_songs_csv(
    path,
    n_rows: int = 200,
    n_genres: int = 5,
    seed: int = 0,
    extra_lines=(),
):
    """Write a synthetic Spotify-schema CSV with the reference's required
    columns (reference DataManager.cpp:121-125)."""
    rng = np.random.default_rng(seed)
    header = (
        "track_id,track_name,artists,album_name,danceability,energy,key,"
        "loudness,mode,speechiness,acousticness,instrumentalness,liveness,"
        "valence,tempo,track_genre"
    )
    keys = ["C", "C#", "D", "Eb", "E", "F", "F#", "G", "Ab", "A", "Bb", "B"]
    lines = [header]
    for i in range(n_rows):
        vals = rng.random(8)
        loud = -60 + 60 * rng.random()
        tempo = 40 + 180 * rng.random()
        key = keys[rng.integers(0, 12)] if i % 3 == 0 else str(rng.integers(0, 12))
        mode = ["Major", "Minor", "1", "0"][rng.integers(0, 4)]
        genre = f"genre-{rng.integers(0, n_genres)}"
        lines.append(
            f"id{i:05d},Song {i},Artist {i % 37},Album {i % 11},"
            f"{vals[0]:.4f},{vals[1]:.4f},{key},{loud:.3f},{mode},"
            f"{vals[2]:.4f},{vals[3]:.4f},{vals[4]:.4f},{vals[5]:.4f},"
            f"{vals[6]:.4f},{tempo:.3f},{genre}"
        )
    lines.extend(extra_lines)
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return path


@pytest.fixture
def songs_csv(tmp_path):
    return make_songs_csv(tmp_path / "songs.csv")


def reference_cpu_similarities(query: np.ndarray, features: np.ndarray) -> np.ndarray:
    """Direct transcription of the reference's CPU scorer semantics
    (reference Recommender.cu:256-273) in numpy fp32 — the parity oracle."""
    query = query.astype(np.float32)
    features = features.astype(np.float32)
    qnorm = np.sqrt(np.sum(query * query, dtype=np.float32))
    dots = features @ query
    norms = np.sqrt(np.sum(features * features, axis=1, dtype=np.float32))
    denom = norms * qnorm
    with np.errstate(divide="ignore", invalid="ignore"):
        sims = np.clip(dots / denom, -1.0, 1.0)
    return np.where(denom > 1e-8, sims, 0.0).astype(np.float32)


def reference_topk(sims: np.ndarray, query_index: int, k: int) -> list:
    """The reference's heap selection semantics (Recommender.cu:293-315):
    strict-greater replacement = lowest index wins on boundary ties;
    final order: descending score, ties by ascending index."""
    order = np.lexsort((np.arange(len(sims)), -sims))
    order = order[order != query_index]
    return list(order[:k])

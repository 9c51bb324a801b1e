"""ops/autotune: on-device tuning sweep + persisted per-shape cache."""

import json
import os

import numpy as np
import pytest

from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.ops import autotune


def test_tune_picks_and_persists_then_loads(tmp_path, monkeypatch):
    monkeypatch.setenv("SRT_AUTOTUNE_CACHE", str(tmp_path / "at.json"))
    # tiny shapes + 2 candidates: interpret-mode timing is meaningless
    # as a measurement but exercises the full sweep/persist/load path
    cfg = autotune.tune(
        n=2048, b=8, f=12, k=5,
        grid=((2, 3, 128, 8), (3, 0, 128, 8)),
        iters=1, reps=1, interpret=True,
    )
    assert isinstance(cfg, RetrievalConfig)
    assert (cfg.scan_depth, cfg.scan_escalate) in ((2, 3), (3, 0))
    path = str(tmp_path / "at.json")
    assert os.path.exists(path)
    with open(path) as fh:
        cache = json.load(fh)
    assert len(cache) == 1
    entry = next(iter(cache.values()))
    assert entry["n"] == 2048 and entry["ms"] > 0

    # read side: same bucket hits, carries base fields through
    base = RetrievalConfig(prefilter=64)
    got = autotune.load_tuned(2048, 8, 12, 5, base=base)
    assert got is not None
    assert got.prefilter == 64
    assert got.scan_depth == cfg.scan_depth
    # nearby shape in the same log2 bucket also hits
    assert autotune.load_tuned(2000, 8, 12, 5) is not None
    # far shape misses
    assert autotune.load_tuned(1_000_000, 1024, 12, 5) is None


def test_load_tuned_empty_cache_returns_none(tmp_path, monkeypatch):
    monkeypatch.setenv("SRT_AUTOTUNE_CACHE", str(tmp_path / "none.json"))
    assert autotune.load_tuned(4096, 16, 12, 10) is None

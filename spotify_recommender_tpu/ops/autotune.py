"""One-shot on-chip autotuner for the certified retrieval kernel.

The production defaults (query_tile=256, catalog_tile=8192, W=128,
depth=2 + escalate-3) were hand-tuned on a v5e at the benchmark shapes
(docs/PERFORMANCE.md round-2..5 sweeps).  Other (catalog, batch, dim)
regimes — or other TPU generations — can sit elsewhere on the
register-pressure/coverage/stream trade-off, so `tune()` measures a
small candidate grid ON THE ACTUAL DEVICE with the caller's shapes and
persists the winner, keyed by (device kind, N-bucket, B-bucket, F, k).

`load_tuned()` is the zero-cost read side: the benchmark and any
long-lived server consult it at startup and fall back to the hand-tuned
defaults when no cache entry exists.

Timing uses the chained-dependency + single-readback pattern (see
benchmark.py): on tunneled dev backends `block_until_ready` can ack
early, so each measurement chains iterations through a data dependency
and fetches one scalar.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional, Sequence, Tuple

import numpy as np

from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.core.logging import get_logger

log = get_logger(__name__)

_CACHE_ENV = "SRT_AUTOTUNE_CACHE"
_DEFAULT_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "spotify_recommender_tpu",
    "autotune.json",
)

# (scan_depth, scan_escalate, scan_bins, query_tile) candidates.  Small
# by design: each candidate costs a compile (~10s+ on tunneled
# backends); the grid spans the axes the round-4/5 sweeps showed matter
# (depth/escalation trade, bin width for large k, query-tile register
# footprint).
_DEFAULT_GRID: Tuple[Tuple[int, int, int, int], ...] = (
    (2, 3, 128, 256),      # round-5 production default
    (3, 0, 128, 256),      # round-4 production default
    (2, 3, 256, 256),
    (2, 3, 128, 128),
    (3, 0, 256, 256),
)


def _cache_path() -> str:
    return os.environ.get(_CACHE_ENV, _DEFAULT_CACHE)


def _bucket(x: int) -> int:
    """Log2 bucket: shapes within ~2x share a tuning entry."""
    return int(max(0, int(np.round(np.log2(max(1, x))))))


def _key(n: int, b: int, f: int, k: int) -> str:
    import jax

    dev = jax.devices()[0].device_kind.replace(" ", "_")
    return f"{dev}|n{_bucket(n)}|b{_bucket(b)}|f{f}|k{k}"


def _load_cache() -> dict:
    path = _cache_path()
    if not os.path.exists(path):
        return {}
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError) as e:
        log.warning("autotune cache unreadable (%s); ignoring", e)
        return {}


def load_tuned(
    n: int, b: int, f: int, k: int,
    base: Optional[RetrievalConfig] = None,
) -> Optional[RetrievalConfig]:
    """The cached winning config for this (device, shape) bucket, or
    None.  `base` carries non-tuned fields (eps, prefilter, ...)."""
    entry = _load_cache().get(_key(n, b, f, k))
    if entry is None:
        return None
    base = base or RetrievalConfig()
    return dataclasses.replace(
        base,
        scan_depth=int(entry["scan_depth"]),
        scan_escalate=int(entry["scan_escalate"]),
        scan_bins=int(entry["scan_bins"]),
        query_tile=int(entry["query_tile"]),
    )


def tune(
    n: int,
    b: int,
    f: int = 12,
    k: int = 10,
    grid: Sequence[Tuple[int, int, int, int]] = _DEFAULT_GRID,
    iters: int = 4,
    reps: int = 2,
    seed: int = 0,
    interpret: bool = False,
    save: bool = True,
) -> RetrievalConfig:
    """Measure `grid` on-device at shape (n items, b queries, f dims)
    and persist the winner.  Returns the winning RetrievalConfig."""
    import jax
    import jax.numpy as jnp

    from spotify_recommender_tpu.ops.pallas.fused_topk import (
        CertifiedRetriever,
    )

    rng = np.random.default_rng(seed)
    feats = rng.random((n, f), dtype=np.float32)
    norms = np.linalg.norm(feats, axis=1).astype(np.float32)
    q_rows = rng.integers(0, n, size=b)
    queries = jax.device_put(jnp.asarray(feats[q_rows]))
    excl = np.asarray(q_rows, np.int32)

    def measure(cr) -> float:
        def run(m: int) -> float:
            t0 = time.perf_counter()
            cur = queries
            for _ in range(m):
                s, _i = cr(cur, k, exclude_rows=excl)
                cur = queries + (0.0 * s[0, 0]).astype(queries.dtype)
            float(s[0, 0])                     # one host readback fence
            return (time.perf_counter() - t0) / m

        run(1)                                 # warm (compile)
        return min(run(iters) for _ in range(reps))

    results = []
    for depth, esc, bins, tq in grid:
        cfg = RetrievalConfig(
            scan_depth=depth, scan_escalate=esc, scan_bins=bins,
            query_tile=tq,
        )
        try:
            cr = CertifiedRetriever(
                feats, norms, cfg, interpret=interpret, sync_check=False
            )
            dt = measure(cr)
            cr.verify_no_overflow()
            results.append((dt, (depth, esc, bins, tq)))
            log.info(
                "autotune d=%d esc=%d W=%d tq=%d: %.2f ms",
                depth, esc, bins, tq, dt * 1e3,
            )
            del cr
        except Exception as e:  # pragma: no cover - device-dependent
            log.warning(
                "autotune candidate d=%d esc=%d W=%d tq=%d failed: %s",
                depth, esc, bins, tq, e,
            )
    if not results:
        raise RuntimeError("autotune: every candidate failed")
    best_dt, (depth, esc, bins, tq) = min(results)
    log.info(
        "autotune winner for n=%d b=%d f=%d k=%d: d=%d esc=%d W=%d tq=%d "
        "(%.2f ms)", n, b, f, k, depth, esc, bins, tq, best_dt * 1e3,
    )
    if save:
        path = _cache_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        cache = _load_cache()
        cache[_key(n, b, f, k)] = {
            "scan_depth": depth,
            "scan_escalate": esc,
            "scan_bins": bins,
            "query_tile": tq,
            "ms": round(best_dt * 1e3, 3),
            "n": n, "b": b, "f": f, "k": k,
        }
        with open(path, "w") as fh:
            json.dump(cache, fh, indent=1, sort_keys=True)
        log.info("autotune cache updated: %s", path)
    return RetrievalConfig(
        scan_depth=depth, scan_escalate=esc, scan_bins=bins, query_tile=tq
    )

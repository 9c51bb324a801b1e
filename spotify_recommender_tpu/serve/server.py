"""HTTP retrieval service.

The reference is batch-CLI only (one process per query, reloading the
catalog and re-initializing the device every time — reference
main.cpp:46-63).  This service keeps the Retriever device-resident and
serves queries over HTTP with zero per-request setup:

  GET /healthz                          → {"status": "ok", ...}
  GET /recommend?song=<name>&n=10       → ranked results by name
  GET /recommend?id=<track_id>&n=10     → ranked results by track id
  GET /song/<row>                       → one catalog entry
  POST /retrieve {"queries": [[...]], "k": 10}
                                        → batched raw-vector retrieval

stdlib http.server (threaded) keeps the framework dependency-free; JAX
dispatch is serialized with a lock (single device queue anyway).
"""

from __future__ import annotations

import dataclasses
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.core.logging import get_logger

log = get_logger(__name__)


class RecommenderService:
    """Catalog + retriever behind a lock; the request-handling core,
    separated from HTTP for testability."""

    def __init__(self, catalog, config: Optional[RetrievalConfig] = None):
        from spotify_recommender_tpu.retrieval.retriever import Retriever

        self.retriever = Retriever(catalog, config)
        self._lock = threading.Lock()
        self._stats = {"requests": 0, "errors": 0, "total_latency_s": 0.0}

    def _record(self, t0: float, ok: bool) -> None:
        import time

        with self._lock:
            self._stats["requests"] += 1
            if not ok:
                self._stats["errors"] += 1
            self._stats["total_latency_s"] += time.perf_counter() - t0

    def metrics(self) -> dict:
        s = dict(self._stats)
        n = max(1, s["requests"])
        return {
            "requests": s["requests"],
            "errors": s["errors"],
            "mean_latency_ms": round(1e3 * s["total_latency_s"] / n, 3),
            "num_items": len(self.retriever.catalog),
            "backend": self.retriever._backend,
        }

    def recommend(self, query: str, by_id: bool, k: int) -> dict:
        import time

        t0 = time.perf_counter()
        try:
            with self._lock:
                if by_id:
                    row = self.retriever.index.find_by_track_id(query)
                    recs = self.retriever.recommend_by_id(query, k)
                else:
                    row = self.retriever.index.find_by_name(query)
                    recs = self.retriever.recommend_by_name(query, k)
        except (KeyError, IndexError) as e:
            self._record(t0, ok=False)
            return {"error": e.args[0] if e.args else str(e), "status": 404}
        self._record(t0, ok=True)
        return {
            "query": dataclasses.asdict(self.retriever.lookup(row)),
            "results": [dataclasses.asdict(r) for r in recs],
            "status": 200,
        }

    def song(self, row: int) -> dict:
        if row < 0 or row >= len(self.retriever.catalog):
            return {"error": f"row {row} out of range", "status": 404}
        return {"song": dataclasses.asdict(self.retriever.lookup(row)), "status": 200}

    def retrieve(self, queries, k: int) -> dict:
        q = np.asarray(queries, np.float32)
        if q.ndim != 2 or q.shape[1] != self.retriever.catalog.features.shape[1]:
            return {
                "error": f"queries must be (B, {self.retriever.catalog.features.shape[1]})",
                "status": 400,
            }
        with self._lock:
            scores, rows = self.retriever.retrieve(q, k=k)
        return {
            "scores": np.asarray(scores).tolist(),
            "rows": np.asarray(rows).tolist(),
            "status": 200,
        }

    def health(self) -> dict:
        return {
            "status": "ok",
            "num_items": len(self.retriever.catalog),
            "backend": self.retriever._backend,
        }


def _make_handler(service: RecommenderService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, payload: dict) -> None:
            code = payload.get("status", 200)
            if isinstance(code, int):
                payload.pop("status", None)
            else:
                code = 200  # payload-level status strings (e.g. healthz "ok")
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 (stdlib API)
            url = urlparse(self.path)
            qs = parse_qs(url.query)
            try:
                if url.path == "/healthz":
                    self._send(self.server_service.health())
                elif url.path == "/metrics":
                    self._send(self.server_service.metrics())
                elif url.path == "/recommend":
                    k = int(qs.get("n", ["10"])[0])
                    if "id" in qs:
                        self._send(
                            self.server_service.recommend(qs["id"][0], True, k)
                        )
                    elif "song" in qs:
                        self._send(
                            self.server_service.recommend(qs["song"][0], False, k)
                        )
                    else:
                        self._send({"error": "need ?song= or ?id=", "status": 400})
                elif url.path.startswith("/song/"):
                    self._send(self.server_service.song(int(url.path[6:])))
                else:
                    self._send({"error": "not found", "status": 404})
            except Exception as e:  # pragma: no cover
                self._send({"error": str(e), "status": 500})

        def do_POST(self) -> None:  # noqa: N802
            url = urlparse(self.path)
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                if url.path == "/retrieve":
                    self._send(
                        self.server_service.retrieve(
                            body.get("queries", []), int(body.get("k", 10))
                        )
                    )
                else:
                    self._send({"error": "not found", "status": 404})
            except (ValueError, json.JSONDecodeError) as e:
                self._send({"error": f"bad request: {e}", "status": 400})

        def log_message(self, fmt, *args):  # route to our logger
            log.info("http %s", fmt % args)

    return Handler


def make_server(
    catalog, host: str = "127.0.0.1", port: int = 8000,
    config: Optional[RetrievalConfig] = None,
) -> ThreadingHTTPServer:
    service = RecommenderService(catalog, config)
    handler = _make_handler(service)
    srv = ThreadingHTTPServer((host, port), handler)
    srv.server_service = service  # type: ignore[attr-defined]
    handler.server_service = service  # type: ignore[attr-defined]
    return srv


def serve(catalog_path: str, host: str = "127.0.0.1", port: int = 8000) -> int:
    from spotify_recommender_tpu.data.catalog import Catalog

    cat = (
        Catalog.load_reference_binary(catalog_path)
        if catalog_path.endswith(".bin")
        else Catalog.load(catalog_path)
    )
    srv = make_server(cat, host, port)
    log.info("serving %d items on http://%s:%d", len(cat), host, port)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
    return 0

"""Serving load test: concurrent HTTP /recommend against a 1M catalog.

Measures aggregate qps and coalescer effectiveness (VERDICT r1 item 6's
done-criterion: a load test showing >1 request in flight and higher
aggregate qps than serialized dispatch).

    python experiments/serve_load.py [n_items] [n_clients] [requests_each]
"""

import json
import sys
import threading
import time
import urllib.request

import numpy as np

from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.data.catalog import Catalog
from spotify_recommender_tpu.serve.server import make_server


def main():
    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_clients = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reqs_each = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    rng = np.random.default_rng(0)
    feats = rng.random((n_items, 12), dtype=np.float32)
    cat = Catalog(
        features=feats,
        norms=np.linalg.norm(feats, axis=1).astype(np.float32),
        track_ids=np.asarray([f"tid{i:08d}" for i in range(n_items)], object),
        track_names=np.asarray([f"Song {i}" for i in range(n_items)], object),
        artists=np.asarray([f"Artist {i % 997}" for i in range(n_items)], object),
        genre_ids=np.zeros(n_items, np.int32),
        genre_names=["all"],
        min_vals=np.zeros(11, np.float32),
        max_vals=np.ones(11, np.float32),
    )
    srv = make_server(cat, "127.0.0.1", 0, RetrievalConfig(),
                      coalesce_window_ms=3.0)
    t0 = time.perf_counter()
    srv.server_service.warmup()
    print(f"startup warmup: {time.perf_counter()-t0:.1f}s", flush=True)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    ids = [f"tid{i:08d}" for i in rng.integers(0, n_items, n_clients * reqs_each)]
    errors = []

    def client(c):
        for j in range(reqs_each):
            tid = ids[c * reqs_each + j]
            try:
                with urllib.request.urlopen(
                    f"{base}/recommend?id={tid}&n=10", timeout=300
                ) as r:
                    if r.status != 200:
                        errors.append(r.status)
            except Exception as e:
                errors.append(str(e))

    def run_round():
        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return time.perf_counter() - t0

    # round 1 warms every coalesced-batch-size bucket's compiled kernel
    warm = run_round()
    print(f"warmup round (compiles): {warm:.1f}s", flush=True)
    dt = run_round()
    total = n_clients * reqs_each

    with urllib.request.urlopen(f"{base}/metrics") as r:
        metrics = json.loads(r.read())
    co = metrics["coalescer"]
    print(f"{total} requests from {n_clients} clients in {dt:.1f}s "
          f"= {total/dt:.0f} req/s aggregate; errors={len(errors)}")
    print(f"coalescer: {co['batches']} kernel batches for "
          f"{co['batched_requests']} requests "
          f"(mean {co['batched_requests']/max(1,co['batches']):.1f}/batch, "
          f"max {co['max_batch_size']})")
    print(f"mean request latency: {metrics['mean_latency_ms']:.1f} ms; "
          f"certificate fallbacks: {metrics.get('certificate_fallbacks')}")
    srv.shutdown()


if __name__ == "__main__":
    main()

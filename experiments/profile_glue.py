import time
import jax, jax.numpy as jnp, numpy as np
from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.ops.pallas.fused_topk import CertifiedRetriever, _certified_retrieve
from spotify_recommender_tpu.ops.similarity import exact_topk_iterative

B, N, F, K = 1024, 1_000_000, 12, 10
rng = np.random.default_rng(0)
feats = rng.random((N, F), dtype=np.float32)
norms = np.linalg.norm(feats, axis=1).astype(np.float32)
q = feats[rng.integers(0, N, B)]
excl = jnp.asarray(np.full(B, -1, np.int32))
dq = jnp.asarray(q)
cr = CertifiedRetriever(feats, norms)

def run_once(tag):
    t = {}
    t0 = time.perf_counter()
    s, i, ok = _certified_retrieve(dq, cr.features_t2, cr.norms_row,
        cr.features32, cr.norms1d, excl, cr._valid,
        k=K, c=32, tq=512, tc=cr.tc, w=cr.w, eps=1e-8, ceps=2e-5)
    t["dispatch"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ok_h = np.asarray(ok)
    t["sync_ok"] = time.perf_counter() - t0

    bad = np.nonzero(~ok_h)[0]
    t0 = time.perf_counter()
    qb = dq[bad]
    eb = excl[bad]
    t["slice"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    fs, fi = exact_topk_iterative(qb, cr.features32, cr.norms1d,
                                  exclude_rows=eb, k=K)
    fs_h = np.asarray(fs); fi_h = np.asarray(fi)
    t["fallback+sync"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    s2 = jnp.asarray(np.asarray(s)).at[bad].set(fs_h)
    i2 = jnp.asarray(np.asarray(i)).at[bad].set(fi_h)
    jax.block_until_ready((s2, i2))
    t["splice"] = time.perf_counter() - t0
    print(tag, {k2: round(v*1e3,2) for k2,v in t.items()}, "bad:", len(bad), flush=True)

run_once("warmup")
for r in range(4):
    run_once(f"run{r}")

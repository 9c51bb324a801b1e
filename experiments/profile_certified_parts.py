import time, functools
import jax, jax.numpy as jnp, numpy as np
from spotify_recommender_tpu.core.config import RetrievalConfig
from spotify_recommender_tpu.ops.pallas.fused_topk import (
    CertifiedRetriever, _scan_call, _certified_retrieve, _round_up)

B, N, F, K = 1024, 1_000_000, 12, 10
rng = np.random.default_rng(0)
feats = rng.random((N, F), dtype=np.float32)
norms = np.linalg.norm(feats, axis=1).astype(np.float32)
q = feats[rng.integers(0, N, B)]
dq = jnp.asarray(q)
excl = jnp.asarray(np.full(B, -1, np.int32))
cr = CertifiedRetriever(feats, norms, sync_check=False)

# scan alone
@functools.partial(jax.jit, static_argnames=("tq","tc","w"))
def scan_only(queries, ft2, nrm, excl_p, valid, *, tq, tc, w):
    b, f = queries.shape
    bp = _round_up(b, tq)
    q_pad = jnp.zeros((bp, f), jnp.float32).at[:b].set(queries)
    qn = jnp.linalg.norm(q_pad, axis=1, keepdims=True)
    qunit = q_pad / jnp.maximum(qn, 1e-30)
    qh = qunit.astype(jnp.bfloat16)
    ql = (qunit - qh.astype(jnp.float32)).astype(jnp.bfloat16)
    q2 = jnp.concatenate([qh, ql, ql, qh], axis=1)
    ep = jnp.full((bp, 1), -1, jnp.int32)
    cv, ci, cb = _scan_call(q2, qn, ft2, nrm, ep, valid, tq=tq, tc=tc, w=w, eps=1e-8)
    return cv[:b, :1]

def chain(fn, n):
    t0 = time.perf_counter()
    cur = dq
    for _ in range(n):
        out = fn(cur)
        first = out[0] if isinstance(out, tuple) else out
        cur = dq + 0.0 * first[0, 0]
    float(first[0, 0])
    return (time.perf_counter() - t0) / n

f1 = lambda c: scan_only(c, cr.features_t2, cr.norms_row, excl, cr._valid, tq=512, tc=cr.tc, w=cr.w)
chain(f1, 1)
print(f"scan only:           {chain(f1,20)*1e3:6.2f} ms", flush=True)

f2 = lambda c: _certified_retrieve(c, cr.features_t2, cr.norms_row, cr.features32,
    cr.norms1d, excl, cr._valid, k=K, c=32, tq=512, tc=cr.tc, w=cr.w,
    eps=1e-8, ceps=2e-5, fallback_cap=0, bitexact_rerank=True)
chain(f2, 1)
print(f"scan+topk+rerank:    {chain(f2,20)*1e3:6.2f} ms", flush=True)

f3 = lambda c: _certified_retrieve(c, cr.features_t2, cr.norms_row, cr.features32,
    cr.norms1d, excl, cr._valid, k=K, c=32, tq=512, tc=cr.tc, w=cr.w,
    eps=1e-8, ceps=2e-5, fallback_cap=32, bitexact_rerank=True)
chain(f3, 1)
print(f"+ in-jit fallback:   {chain(f3,20)*1e3:6.2f} ms", flush=True)

# scan with bigger tc
for tc in (16384, 32768):
    cfg = RetrievalConfig(catalog_tile=tc)
    cr2 = CertifiedRetriever(feats, norms, cfg, sync_check=False)
    g1 = lambda c: scan_only(c, cr2.features_t2, cr2.norms_row, excl, cr2._valid, tq=512, tc=tc, w=cr2.w)
    try:
        chain(g1, 1)
        print(f"scan only tc={tc}: {chain(g1,20)*1e3:6.2f} ms  (w={cr2.w})", flush=True)
    except Exception as e:
        print(f"scan tc={tc}: FAILED {str(e)[:120]}", flush=True)

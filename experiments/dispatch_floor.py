import time
import jax, jax.numpy as jnp, numpy as np

x = jax.device_put(np.ones(8, np.float32))
big = jax.device_put(np.ones((1024, 768), np.float32))

@jax.jit
def tiny(v): return v + 1.0

@jax.jit
def topk(v): return jax.lax.top_k(v, 64)

def chain(fn, inp, n):
    t0 = time.perf_counter()
    cur = inp
    for _ in range(n):
        out = fn(cur)
        cur = inp + 0.0 * (out[0] if isinstance(out, tuple) else out).ravel()[0]
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    float((out[0] if isinstance(out, tuple) else out).ravel()[0])
    return (time.perf_counter() - t0) / n

chain(tiny, x, 1)
print(f"tiny chained      {chain(tiny, x, 50)*1e3:7.3f} ms/iter")
# unchained (pipelined) tiny dispatches
t0 = time.perf_counter()
outs = [tiny(x) for _ in range(200)]
jax.block_until_ready(outs)
float(outs[-1][0])
print(f"tiny pipelined    {(time.perf_counter()-t0)/200*1e3:7.3f} ms/iter")
chain(topk, big, 1)
print(f"topk chained      {chain(topk, big, 50)*1e3:7.3f} ms/iter")

"""Two-process `jax.distributed` bootstrap — the one piece of the
distributed story a virtual mesh cannot fake (SURVEY.md §5).

Spawns 2 real CPU processes against a localhost coordinator, runs
`initialize_multihost` + `global_mesh`, one cross-process psum, and one
small sharded retrieval; a separate case asserts the fail-fast
diagnostic on broken bootstrap configurations
(parallel/distributed.py:28-74).  (A truly unreachable coordinator is
hard-aborted by the coordination client itself — absl FATAL, no Python
frame — so the catchable surface is config errors.)"""

import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from spotify_recommender_tpu.parallel.distributed import (
    global_mesh, initialize_multihost,
)

coord = sys.argv[1]
pid = int(sys.argv[2])
initialize_multihost(
    coordinator_address=coord, num_processes=2, process_id=pid,
    timeout_s=60,
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

mesh = global_mesh(axis_sizes=(1, 4))

# cross-process psum: every device contributes its catalog-axis index
def body(_):
    i = jax.lax.axis_index("catalog").astype(jnp.float32)
    return jax.lax.psum(i[None], "catalog")

total = jax.shard_map(
    body, mesh=mesh, in_specs=(P(),), out_specs=P(), check_vma=False
)(jnp.zeros((1,), jnp.float32))
np.testing.assert_allclose(np.asarray(total), [0.0 + 1 + 2 + 3])

# small sharded retrieval over the 2-host mesh (XLA oracle backend):
# identical replicated inputs on both processes, replicated output
from spotify_recommender_tpu.parallel.sharding import ShardedCatalog

rng = np.random.default_rng(0)
feats = rng.random((1024, 12), dtype=np.float32)
norms = np.linalg.norm(feats, axis=1).astype(np.float32)
sc = ShardedCatalog(feats, norms, mesh)
q = jnp.asarray(feats[:4])
s, r = sc.retrieve(q, k=5)
jax.block_until_ready((s, r))

from spotify_recommender_tpu.ops import similarity

# compare against a process-local dense oracle
es, er = jax.jit(
    lambda: similarity.exact_topk(
        q, jnp.asarray(feats), jnp.asarray(norms), k=5
    )
)()
np.testing.assert_array_equal(np.asarray(r), np.asarray(er))
print(f"proc {pid} OK")
"""

_BAD_CONFIG = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from spotify_recommender_tpu.parallel.distributed import initialize_multihost

# case 1: multi-process requested with no coordinator spec anywhere —
# auto-detection has nothing to find and must fail fast with the wrapped
# diagnostic, not hang
try:
    initialize_multihost(num_processes=2, process_id=1, timeout_s=5)
    sys.exit(1)
except RuntimeError as e:
    assert "coordinator address is reachable" in str(e), e

# case 2: the backend was already touched (the exact misuse
# initialize_multihost's is_initialized() guard cannot excuse) — the
# underlying jax error must surface wrapped in the same diagnostic
jax.devices()
try:
    initialize_multihost(
        coordinator_address=sys.argv[1], num_processes=2, process_id=0,
        timeout_s=5,
    )
    sys.exit(1)
except RuntimeError as e:
    assert "coordinator address is reachable" in str(e), e
print("fail-fast OK")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_two_process_bootstrap_psum_and_sharded_retrieval(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=_env(), text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("two-process bootstrap timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out


def test_bad_config_fails_fast_with_diagnostic(tmp_path):
    worker = tmp_path / "bad.py"
    worker.write_text(_BAD_CONFIG)
    coord = f"127.0.0.1:{_free_port()}"   # nothing listening
    env = _env()
    env.pop("JAX_COORDINATOR_ADDRESS", None)   # case 1 needs a bare env
    p = subprocess.run(
        [sys.executable, str(worker), coord],
        capture_output=True, env=env, text=True, timeout=110,
    )
    assert p.returncode == 0, p.stdout + p.stderr
    assert "fail-fast OK" in p.stdout

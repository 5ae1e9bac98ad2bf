"""Multi-host scaffolding: 2-process CPU smoke test over a Gloo mesh.

Each subprocess joins a 2-process JAX runtime (4 fake CPU devices per
process => an 8-device global mesh), feeds only its local rows via
``multihost.distribute_rows``, runs the full SPMD sharded search, and
checks the merged top-k against the numpy oracle plus its host-sharded
string-table span. Real DCN runs need real hardware; this pins the
process wiring, the local-feed path, and the global-mesh correctness.
"""

import socket
import subprocess
import sys
import os

import numpy as np
import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4 " \
    "--xla_cpu_enable_fast_math=false"
import jax
jax.config.update("jax_platforms", "cpu")

from gpusimilarity_tpu.parallel import multihost, sharded
from gpusimilarity_tpu.parallel.mesh import make_mesh
from gpusimilarity_tpu.ops.scan import popcount_rows_np, scores_np

multihost.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

import numpy as np
rng = np.random.default_rng(1234)  # same seed: both processes know the data
n, w = 4096, 32
words = rng.integers(0, 2**32, (n, w), dtype=np.uint32)
mesh = make_mesh(jax.devices())

lo, hi = multihost.process_row_span(mesh, n)
assert (lo, hi) == ((0, 2048) if pid == 0 else (2048, 4096)), (lo, hi)

planar_local = np.ascontiguousarray(words[lo:hi].T)
pops_local = popcount_rows_np(words[lo:hi])
gwords, gpops = multihost.distribute_rows(planar_local, pops_local, mesh)
store = sharded.build_store_from_device(gwords, gpops, n_valid=n, mesh=mesh,
                                        chunk_cols=512)

search = sharded.build_search_fn(store, k=10, similarity="tanimoto", batch=2)
queries = words[[7, 3000]]
import jax.numpy as jnp
vals, idx, approx = search(
    jnp.asarray(queries), jnp.asarray(popcount_rows_np(queries)),
    jnp.asarray(np.zeros(2, np.float32)), jnp.float32(1.0), jnp.float32(1.0),
)
vals, idx = np.asarray(jax.device_get(vals)), np.asarray(jax.device_get(idx))

s = scores_np(words, queries)
for qi in range(2):
    order = np.lexsort((np.arange(n), -s[qi]))[:10]
    np.testing.assert_allclose(vals[qi], s[qi][order], rtol=0)
    np.testing.assert_array_equal(idx[qi], order)

# host-sharded string table: this process resolves exactly its own span
ids = [f"ID{i:06d}".encode() for i in range(lo, hi)]
table = multihost.HostStrings(ids, lo, hi)
for gi in idx.reshape(-1):
    gi = int(gi)
    got = table.get(gi)
    if lo <= gi < hi:
        assert got == f"ID{gi:06d}".encode()
    else:
        assert got is None
print(f"proc {pid} OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh_search(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
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
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out

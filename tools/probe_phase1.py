"""Probe what bounds the batched bitplane phase-1 kernel on the real chip.

Times the isolated kernel (no selection/phase-2) at 96M rows for several
(batch, qpop, mc8) combinations. If time scales with qpop -> DMA/CSA bound;
if flat -> expansion/score bound; phase1 vs full-search gap -> merge/phase2
overhead.
"""

import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gpusimilarity_tpu.ops.pallas_bitplane import (  # noqa: E402
    pallas_bitplane_phase1_batched,
)

N_ROWS = 100663296
BITCOUNT = 1024
M8S = N_ROWS // 256


@jax.jit
def make_planes(key):
    return jax.random.bits(key, ((BITCOUNT + 1) * 8, M8S), dtype=jnp.uint32)


planes = make_planes(jax.random.key(0))
planes.block_until_ready()
pops3 = jnp.zeros((32, 8, M8S), jnp.int32) + 102  # constant pops: timing only
ab = jnp.ones(2, jnp.float32)

rng = np.random.default_rng(0)


def run(b, qpop, mc8, reps=5):
    idx = np.stack([
        np.sort(rng.choice(BITCOUNT, qpop, replace=False)) for _ in range(b)
    ]).astype(np.int32)
    qpops = np.full(b, qpop, np.int32)
    cuts = np.zeros(b, np.float32)

    def go():
        bm, cnt, _colmax = pallas_bitplane_phase1_batched(
            planes, pops3, jnp.asarray(idx), jnp.asarray(qpops),
            jnp.asarray(cuts), ab, jnp.int32(0),
            mc8=mc8, bw8=8, n_valid=N_ROWS,
        )
        return bm

    import jax as _jax

    def sync():
        # block_until_ready appears to return at enqueue time under the
        # axon relay; a value fetch cannot complete before execution
        return float(_jax.device_get(go()[0, 0]))

    t0 = time.monotonic()
    sync()
    compile_s = time.monotonic() - t0
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        sync()
        ts.append(time.monotonic() - t0)
    p50 = statistics.median(ts) * 1e3
    print(
        f"B={b} qpop={qpop} mc8={mc8}: p50={p50:.1f} ms "
        f"(on-chip ~{p50 - 24:.1f}), compile={compile_s:.0f}s",
        flush=True,
    )


run(1, 50, 1024)
run(8, 50, 1024)
run(8, 25, 1024)
run(8, 100, 1024)
run(8, 50, 512)
run(8, 50, 256)

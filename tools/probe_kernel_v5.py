"""On-chip validation + timing for the round-5 bitplane kernel changes.

Checks the quad (byte-field) reconstruction and the rational cutoff<=0
branch compile under Mosaic and return bit-identical results to interpret
mode, then times B=32 at a mid-size library for a quick read on the
compute cut. Full numbers come from bench.py afterwards.
"""

import os
import statistics
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from gpusimilarity_tpu.ops.bitplane import (  # noqa: E402
    build_bitplanes_np, query_plane_indices,
)
from gpusimilarity_tpu.ops.pallas_bitplane import (  # noqa: E402
    build_pops3, pallas_bitplane_phase1_batched,
)
from gpusimilarity_tpu.ops.scan import popcount_rows_np  # noqa: E402

SMALL_N = 2 ** 21  # 2M rows: correctness vs interpret
rng = np.random.default_rng(0)


def make_lib(n, density=0.06):
    bits = rng.random((n, 1024), dtype=np.float32) < density
    packed = np.packbits(bits, axis=1, bitorder="little")
    words = packed.view(np.uint32).reshape(n, 32)
    planes = build_bitplanes_np(packed.view(np.uint8), n)
    planes = np.concatenate([planes, np.zeros((1, planes.shape[1]), np.uint32)])
    m8s = n // 256
    arranged = planes.reshape(1025, 8, m8s).reshape(1025 * 8, m8s)
    pops = popcount_rows_np(words).astype(np.int32)
    return words, arranged, np.asarray(build_pops3(pops, 1)), pops


def run_phase1(arranged, pops3, plane_idx, qpops, cuts, n, mc8, interpret):
    return pallas_bitplane_phase1_batched(
        jnp.asarray(arranged), jnp.asarray(pops3), jnp.asarray(plane_idx),
        jnp.asarray(qpops), jnp.asarray(cuts),
        jnp.asarray(np.ones(2, np.float32)), jnp.int32(0),
        mc8=mc8, bw8=8, n_valid=n, interpret=interpret,
    )


# ---- correctness: Mosaic vs interpret, both branches --------------------
words, arranged, pops3, pops = make_lib(SMALL_N)
queries = words[:8]
plane_idx, bucket = query_plane_indices(queries, 1024)
qpops = popcount_rows_np(queries).astype(np.int32)
cuts = np.array([0.0, 0.2, 0.0, 0.3, 0.0, 0.0, 0.25, 0.0], np.float32)
print(f"bucket={bucket} (quad recon {'ON' if bucket <= 255 else 'off'})",
      flush=True)

t0 = time.monotonic()
bm_d, cnt_d, cm_d = run_phase1(
    arranged, pops3, plane_idx, qpops, cuts, SMALL_N, 1024, False)
bm_d, cnt_d, cm_d = map(np.asarray, (bm_d, cnt_d, cm_d))
print(f"Mosaic compile+run: {time.monotonic() - t0:.0f}s", flush=True)

bm_i, cnt_i, cm_i = map(np.asarray, run_phase1(
    arranged, pops3, plane_idx, qpops, cuts, SMALL_N, 1024, True))
for name, a, b in (("block_max", bm_d, bm_i), ("cnt", cnt_d, cnt_i),
                   ("colmax", cm_d, cm_i)):
    same = np.array_equal(a, b)
    print(f"{name}: {'BIT-IDENTICAL' if same else 'MISMATCH'}", flush=True)
    if not same:
        bad = np.argwhere(a != b)
        print(f"  first diffs {bad[:5].tolist()}: "
              f"{a[tuple(bad[0])]} vs {b[tuple(bad[0])]}", flush=True)
        sys.exit(1)

# ---- timing: B=32 / B=1 at 96M, cutoff 0 (rational) vs 0.2 (div) --------
N = 100663296
M8S = N // 256


@jax.jit
def make_planes(key):
    return jax.random.bits(key, (1025 * 8, M8S), dtype=jnp.uint32)


planes_big = make_planes(jax.random.key(0))
planes_big.block_until_ready()
pops3_big = jnp.zeros((32, 8, M8S), jnp.int32) + 102
ab = jnp.ones(2, jnp.float32)


@jax.jit
def floor_fn(x):
    return x + 1.0


floor_x = jnp.zeros((8, 128), jnp.float32)


def measure_floor():
    ts = []
    for _ in range(5):
        t0 = time.monotonic()
        float(jax.device_get(floor_fn(floor_x)[0, 0]))
        ts.append(time.monotonic() - t0)
    return statistics.median(ts) * 1e3


def timing(b, qpop, cut, mc8=2048, reps=7):
    idx = np.stack([
        np.sort(rng.choice(1024, qpop, replace=False)) for _ in range(b)
    ]).astype(np.int32)
    qpops_t = np.full(b, qpop, np.int32)
    cuts_t = np.full(b, cut, np.float32)

    def sync():
        bm, _, _ = pallas_bitplane_phase1_batched(
            planes_big, pops3_big, jnp.asarray(idx), jnp.asarray(qpops_t),
            jnp.asarray(cuts_t), ab, jnp.int32(0),
            mc8=mc8, bw8=8, n_valid=N)
        return float(jax.device_get(bm[0, 0]))

    t0 = time.monotonic()
    sync()
    compile_s = time.monotonic() - t0
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        sync()
        ts.append(time.monotonic() - t0)
    p50 = statistics.median(ts) * 1e3
    fl = measure_floor()
    print(f"B={b} qpop={qpop} cut={cut}: p50={p50:.1f} ms, floor={fl:.1f} "
          f"SAME RUN -> on-chip ~{p50 - fl:.1f} ms "
          f"({N * b / (p50 - fl) / 1e6:.1f}e9 fp/s kernel-only), "
          f"compile={compile_s:.0f}s", flush=True)


if os.environ.get("PROBE_TIMING", "1") == "1":
    print(f"initial floor: {measure_floor():.1f} ms", flush=True)
    timing(32, 50, 0.0)   # rational branch (top-k default)
    timing(32, 50, 0.2)   # division branch
    timing(1, 50, 0.0)
    timing(64, 50, 0.0)

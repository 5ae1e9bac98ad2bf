"""Measure the MXU int8/bf16 dot-product scan against the bitplane kernel.

SURVEY.md:107 and its build plan (§7.3) name the MXU reformulation
``popcount(a&b) = <bits(a), bits(b)>`` as the designed alternative
backend; round-3's verdict asked for a measured keep/reject decision.
This probe times ``ops/pallas_mxu.mxu_scan_phase1`` (one-time VMEM unpack
of each packed tile + one MXU matmul for the whole query batch) against
``ops/pallas_bitplane`` (per-query CSA over ~qpop set-bit planes) on the
same row count, device_get-synced with a same-run dispatch floor.

The two kernels read different resident layouts (dense words vs bit
planes), so both stores are generated on device and the comparison is
end-cost per batch, not per-byte. Emits one JSON line per config.

Usage: python tools/probe_mxu.py [--rows 32M] [--batches 32,128] [--mc 2048]
"""

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=32 * 1024 * 1024)
    ap.add_argument("--batches", type=str, default="32,128")
    ap.add_argument("--mc", type=int, default=16384)
    ap.add_argument("--bw", type=int, default=128,
                    help="block width; bw and mc/bw must be multiples of 128")
    ap.add_argument("--qpop", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=7)
    ap.add_argument("--skip_bitplane", action="store_true")
    ap.add_argument("--int8", type=str, default="1,0",
                    help="comma list: 1=int8 MXU, 0=bf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gpusimilarity_tpu.ops.pallas_mxu import mxu_scan_phase1, query_bits_np
    from gpusimilarity_tpu.ops.scan import popcount_rows_np

    n = args.rows
    rng = np.random.default_rng(7)

    def timeit(fn, fetch, reps):
        t0 = time.monotonic()
        fetch(fn())
        compile_s = time.monotonic() - t0
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            fetch(fn())
            ts.append(time.monotonic() - t0)
        return statistics.median(ts), compile_s

    trivial = jax.jit(lambda x: x + 1)
    tiny = jnp.zeros(8, jnp.float32)
    jax.device_get(trivial(tiny))
    floor = statistics.median(
        [timeit(lambda: trivial(tiny), jax.device_get, 1)[0] for _ in range(7)]
    )
    print(f"# dispatch floor: {floor*1e3:.1f} ms", flush=True)

    # ---- dense packed library on device ---------------------------------
    @jax.jit
    def make_dense(key):
        words = jax.random.bits(key, (32, n), dtype=jnp.uint32)
        pops = jnp.sum(jax.lax.population_count(words).astype(jnp.int32), axis=0)
        return words, pops

    words, pops = make_dense(jax.random.key(0))
    jax.device_get(pops[:1])
    print(f"# dense store ready: {n:,} rows", flush=True)

    batches = [int(x) for x in args.batches.split(",")]
    int8s = [x == "1" for x in args.int8.split(",")]
    queries = rng.integers(0, 2**32, (max(batches), 32), dtype=np.uint32)
    qbits_np = query_bits_np(queries)
    qpops_np = popcount_rows_np(queries).astype(np.int32)

    for b in batches:
        for use_int8 in int8s:
            qb = jnp.asarray(qbits_np[:b])
            qp = jnp.asarray(qpops_np[:b])
            cut = jnp.zeros(b, jnp.float32)
            ab = jnp.ones(2, jnp.float32)

            def run():
                return mxu_scan_phase1(
                    words, pops, qb, qp, cut, ab, jnp.int32(0),
                    mc=args.mc, bw=args.bw, n_valid=n, int8_mxu=use_int8,
                )

            try:
                p50, compile_s = timeit(
                    run, lambda o: jax.device_get(o[0][:, :1]), args.repeats
                )
            except Exception as e:
                print(json.dumps({
                    "kernel": "mxu", "int8": use_int8, "batch": b,
                    "error": str(e)[:400],
                }), flush=True)
                continue
            onchip = max(0.0, (p50 - floor)) * 1e3
            print(json.dumps({
                "kernel": "mxu", "int8": use_int8, "batch": b, "rows": n,
                "mc": args.mc, "p50_ms": round(p50 * 1e3, 2),
                "onchip_ms": round(onchip, 2),
                "floor_ms": round(floor * 1e3, 2),
                "fps_per_chip": round(n * b / p50, 1),
                "compile_s": round(compile_s, 1),
            }), flush=True)

    if args.skip_bitplane:
        return

    # ---- bitplane kernel on the same row count --------------------------
    del words, pops
    from gpusimilarity_tpu.ops.bitplane import PLANE_BUCKETS
    from gpusimilarity_tpu.ops.pallas_bitplane import (
        build_pops3,
        pallas_bitplane_phase1_batched,
    )
    from gpusimilarity_tpu.parallel.sharded import _bitplane_kernel_mc8

    bitcount = 1024
    m8 = n // 256

    @jax.jit
    def make_planes(key):
        planes = jax.random.bits(key, ((bitcount + 1) * 8, m8), dtype=jnp.uint32)
        planes = jax.lax.dynamic_update_slice(
            planes, jnp.zeros((8, m8), jnp.uint32), (bitcount * 8, 0)
        )
        acc0 = jnp.zeros((8, m8, 32), jnp.int32)

        def acc(pi, tot):
            rows = jax.lax.dynamic_slice(planes, (8 * pi, 0), (8, m8))
            bits = (rows[..., None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
            return tot + bits.astype(jnp.int32)

        pops3 = jax.lax.fori_loop(0, bitcount, acc, acc0)
        return planes, pops3.reshape(-1)

    planes, pops_flat = make_planes(jax.random.key(1))
    jax.device_get(pops_flat[:1])
    pops3 = jax.jit(lambda pp: build_pops3(pp, 1))(pops_flat)
    print(f"# bitplane store ready", flush=True)

    bucket = next(pb for pb in PLANE_BUCKETS if pb >= args.qpop)
    mc8 = _bitplane_kernel_mc8(bucket)
    while mc8 > 128 and m8 % mc8:
        mc8 //= 2

    for b in batches:
        plane_idx = np.full((b, bucket), bitcount, dtype=np.int32)
        for bq in range(b):
            plane_idx[bq, :args.qpop] = np.sort(
                rng.choice(bitcount, size=args.qpop, replace=False)
            )
        a_idx = jnp.asarray(plane_idx)
        qp = jnp.full(b, args.qpop, jnp.int32)
        cut = jnp.zeros(b, jnp.float32)
        ab = jnp.ones(2, jnp.float32)

        def run():
            return pallas_bitplane_phase1_batched(
                planes, pops3, a_idx, qp, cut, ab, jnp.int32(0),
                mc8=mc8, bw8=8, n_valid=n,
            )

        p50, compile_s = timeit(
            run, lambda o: jax.device_get(o[0][:, :1]), args.repeats
        )
        onchip = max(0.0, (p50 - floor)) * 1e3
        print(json.dumps({
            "kernel": "bitplane", "batch": b, "rows": n, "mc8": mc8,
            "qpop": args.qpop, "p50_ms": round(p50 * 1e3, 2),
            "onchip_ms": round(onchip, 2),
            "floor_ms": round(floor * 1e3, 2),
            "fps_per_chip": round(n * b / p50, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()

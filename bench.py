"""Benchmark: brute-force Tanimoto top-k scan rate on the local chip(s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The headline metric is fingerprints scanned per second per chip for a
single top-128 query over a synthetic 1024-bit library resident in HBM —
directly comparable to the reference's implied rate of ~1.25e9
fingerprints/s per V100 (1e9 compounds / 0.2 s / 4 GPUs, reference
README.md:13; see BASELINE.md).

The library is generated directly on device (random packed words) so the
benchmark measures scan+top-k, not host upload. Row popcounts of random
uint32 words average 512 bits — statistically equivalent to real Morgan
fingerprints for bandwidth/compute purposes (scores are still exact
Tanimoto on the random data).
"""

import json
import os
import statistics
import time

REFERENCE_FPS_PER_GPU = 1.25e9  # BASELINE.md derived figure


def main():
    import sys

    rows_env = int(os.environ.get("TPUSIM_BENCH_ROWS", 104 * 1024 * 1024))
    last_err = None
    # OOM fallback ladder: prefer the long-measured 96M configuration over
    # a blind 2/3 cut when the default (or a larger request) doesn't fit
    fallbacks = [
        r for r in (96 * 1024 * 1024, 64 * 1024 * 1024) if r < rows_env
    ] or [(rows_env * 2 // 3) & ~262143, rows_env // 2]
    for rows in (rows_env, *fallbacks):
        try:
            _run(rows)
            return
        except Exception as e:  # leftover HBM from prior runs can linger
            if "RESOURCE_EXHAUSTED" not in str(e) and "Out of memory" not in str(e):
                raise
            # stderr: stdout must stay ONE JSON line (driver contract)
            print(f"# retrying with fewer rows after OOM at {rows}",
                  file=sys.stderr, flush=True)
            # keep only the message: the traceback would pin _run's frame
            # and with it the multi-GB device arrays, making every smaller
            # retry inherit the leaked HBM
            last_err = RuntimeError(str(e)[:2000])
            del e
            import gc

            gc.collect()
    raise last_err


def _run(n_rows):
    import jax

    # persistent compile cache: the axon remote-compile path costs minutes per
    # program; repeated bench runs should pay it once
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from gpusimilarity_tpu.parallel.mesh import make_mesh
    from gpusimilarity_tpu.parallel.sharded import (
        build_search_fn,
        build_store_from_device,
    )

    # default 104M rows = 14.0 GB of packed fingerprints resident per chip
    # (the 1B-on-8-chips target is 125M/chip; 104M is the measured-safe
    # margin under this chip's 15.75 GB usable HBM beside the int32
    # popcount arrays and the batch-32 phase-1 workspace — 112M OOMs)
    k = int(os.environ.get("TPUSIM_BENCH_K", 128))
    batch = int(os.environ.get("TPUSIM_BENCH_BATCH", 1))
    repeats = int(os.environ.get("TPUSIM_BENCH_REPEATS", 10))
    mode = os.environ.get("TPUSIM_BENCH_MODE", "bitplane")
    if mode not in ("dense", "bitplane"):
        raise ValueError(f"TPUSIM_BENCH_MODE must be dense|bitplane, not {mode!r}")
    use_pallas = os.environ.get("TPUSIM_BENCH_PALLAS", "1") == "1"
    qpop = int(os.environ.get("TPUSIM_BENCH_QPOP", 50))  # typical Morgan density
    w = 32  # 1024-bit fingerprints

    devices = jax.devices()
    mesh = make_mesh(devices)
    n_shards = len(devices)
    per_shard = -(-n_rows // n_shards)
    # bitplane sub-row layout needs 256-column alignment per shard (dense
    # only needs 128); unaligned per-shard widths would silently truncate
    # m8_padded below and skip tail rows
    align = 256 if mode == "bitplane" else 128
    chunk = min(1 << 20, ((per_shard + align - 1) // align) * align)
    chunk = max(align, (chunk // align) * align)
    per_shard = -(-per_shard // chunk) * chunk
    n_padded = per_shard * n_shards

    from jax.sharding import NamedSharding, PartitionSpec as P

    words_sharding = NamedSharding(mesh, P(None, "shards"))
    pops_sharding = NamedSharding(mesh, P("shards"))

    rng = np.random.default_rng(1)

    if mode == "bitplane":
        from gpusimilarity_tpu.ops.bitplane import PLANE_BUCKETS
        from gpusimilarity_tpu.parallel.sharded import (
            BitplaneStore,
            build_bitplane_search_fn,
        )

        bitcount = w * 32
        m8_padded = n_padded // 256  # tile-aligned sub-row layout
        planes_sharding = NamedSharding(mesh, P(None, "shards"))

        @jax.jit
        def make_planes(key):
            planes = jax.random.bits(
                key, ((bitcount + 1) * 8, m8_padded), dtype=jnp.uint32
            )
            # zero the sentinel plane's 8 sub-rows
            planes = jax.lax.dynamic_update_slice(
                planes, jnp.zeros((8, m8_padded), jnp.uint32), (bitcount * 8, 0)
            )
            planes = jax.lax.with_sharding_constraint(planes, planes_sharding)
            # popcounts: random planes are symmetric, so exact per-column pops
            # can be computed plane-by-plane; a constant ~bitcount/2 would bias
            # scores, so accumulate properly over the 1024 plane rows
            m8s_pops = jnp.zeros((8, m8_padded, 32), jnp.int32)

            def acc(pi, tot):
                rows = jax.lax.dynamic_slice(
                    planes, (8 * pi, 0), (8, m8_padded)
                )
                bits = (rows[..., None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
                return tot + bits.astype(jnp.int32)

            pops3 = jax.lax.fori_loop(0, bitcount, acc, m8s_pops)
            # kernel's shard-local flat column = 32*(r*M8s + m_local) + bit:
            # regroup the global (r, m, bit) accumulator shard-by-shard so
            # each shard's slice of the flat pops matches its plane sub-rows
            m8s_local = m8_padded // n_shards
            pops = (
                pops3.reshape(8, n_shards, m8s_local, 32)
                .transpose(1, 0, 2, 3)
                .reshape(-1)
            )
            pops = jax.lax.with_sharding_constraint(pops, pops_sharding)
            return planes, pops

        t0 = time.monotonic()
        planes, pops = make_planes(jax.random.key(0))
        # sync by fetching a slice: block_until_ready can return at enqueue
        # time under the axon relay (CLAUDE.md CAUTION)
        jax.device_get(pops[:1])
        gen_s = time.monotonic() - t0

        pops3 = None
        if use_pallas:
            from gpusimilarity_tpu.ops.pallas_bitplane import build_pops3

            pops3 = jax.jit(lambda pp: build_pops3(pp, n_shards))(pops)
        store = BitplaneStore(
            mesh=mesh, axis="shards", planes=planes, popcounts=pops,
            n_valid=n_rows, chunk_cols=min(1 << 18, chunk), bitcount=bitcount,
            pops3=pops3,
        )
        bucket = next(p for p in PLANE_BUCKETS if p >= qpop)

        def build_for_batch(b):
            search = build_bitplane_search_fn(
                store, k=k, similarity="tanimoto", batch=b,
                plane_bucket=bucket, use_pallas=use_pallas,
            )
            plane_idx = np.full((b, bucket), bitcount, dtype=np.int32)
            for bq in range(b):
                plane_idx[bq, :qpop] = np.sort(
                    rng.choice(bitcount, size=qpop, replace=False)
                )
            return search, jnp.asarray(plane_idx), np.full(b, qpop, np.int32)
    else:
        @jax.jit
        def make_library(key):
            words = jax.random.bits(key, (w, n_padded), dtype=jnp.uint32)
            words = jax.lax.with_sharding_constraint(words, words_sharding)
            pops = jnp.sum(
                jax.lax.population_count(words).astype(jnp.int32), axis=0
            )
            pops = jax.lax.with_sharding_constraint(pops, pops_sharding)
            return words, pops

        t0 = time.monotonic()
        words, pops = make_library(jax.random.key(0))
        jax.device_get(pops[:1])  # fetch-sync, not block_until_ready
        gen_s = time.monotonic() - t0

        store = build_store_from_device(
            words, pops, n_valid=n_rows, mesh=mesh, chunk_cols=chunk
        )
        def build_for_batch(b):
            search = build_search_fn(
                store, k=k, similarity="tanimoto", batch=b,
                use_pallas=use_pallas,
            )
            from gpusimilarity_tpu.ops.scan import popcount_rows_np

            queries = rng.integers(0, 2**32, (b, w), dtype=np.uint32)
            qpops = popcount_rows_np(queries).astype(np.int32)
            return search, jnp.asarray(queries), qpops

    def measure(b, reps):
        search, query_arg, qpops = build_for_batch(b)
        args = (
            query_arg,
            jnp.asarray(qpops),
            jnp.asarray(np.zeros(b, np.float32)),
            jnp.float32(1.0),
            jnp.float32(1.0),
        )
        # sync by FETCHING the result values: block_until_ready can return
        # at enqueue time under the axon relay (observed: a 5 GB-read kernel
        # "completing" in 0.4 ms), and serving fetches the top-k anyway
        t0 = time.monotonic()
        vals, _, _ = search(*args)
        jax.device_get(vals)
        compile_s = time.monotonic() - t0
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            vals, _, _ = search(*args)
            jax.device_get(vals)
            ts.append(time.monotonic() - t0)
        return statistics.median(ts), min(ts), compile_s

    # same-run dispatch floor: the axon relay's fixed round-trip varies
    # 23-29 ms day to day (measured), which is MOST of a B=1 latency —
    # recording it beside the result separates kernel changes from relay
    # weather when comparing rounds
    trivial = jax.jit(lambda x: x + 1)
    tiny = jnp.zeros(8, jnp.float32)
    jax.device_get(trivial(tiny))
    floor_ts = []
    for _ in range(max(5, repeats)):
        t0 = time.monotonic()
        jax.device_get(trivial(tiny))
        floor_ts.append(time.monotonic() - t0)
    floor_ms = statistics.median(floor_ts) * 1e3

    p50, tmin, compile_s = measure(batch, repeats)
    times = [tmin]  # for the extras below
    fps_per_chip = n_rows * batch / p50 / n_shards

    extras = {}
    # batched throughput amortizes the fixed ~24 ms dispatch round-trip:
    # measured B=8 19.7e9, B=16 27.3e9, B=32 34.9e9 fp/s/chip at 96M rows
    throughput_batch = int(os.environ.get("TPUSIM_BENCH_ALSO_BATCH", "32"))
    if batch == 1 and throughput_batch > 1:
        bp50, _, _ = measure(throughput_batch, max(3, repeats // 2))
        extras[f"batch{throughput_batch}_fps_per_chip"] = round(
            n_rows * throughput_batch / bp50 / n_shards, 1
        )
        extras[f"batch{throughput_batch}_p50_ms"] = round(bp50 * 1e3, 3)
    print(
        json.dumps(
            {
                "metric": "fingerprints_scanned_per_sec_per_chip",
                "value": round(fps_per_chip, 1),
                "unit": "fp/s/chip",
                "vs_baseline": round(fps_per_chip / REFERENCE_FPS_PER_GPU, 4),
                "p50_latency_ms": round(p50 * 1e3, 3),
                "rows": n_rows,
                "batch": batch,
                "k": k,
                "chips": n_shards,
                "mode": mode + ("+pallas" if use_pallas else ""),
                "min_latency_ms": round(min(times) * 1e3, 3),
                "dispatch_floor_ms": round(floor_ms, 3),
                "onchip_est_ms": round(p50 * 1e3 - floor_ms, 3),
                "compile_plus_first_run_s": round(compile_s, 2),
                "library_gen_s": round(gen_s, 2),
                "platform": devices[0].platform,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()

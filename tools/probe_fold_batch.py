"""Split the batched folded-search on-chip cost: phase-1 kernel vs selection.

Round-4 finding: the fold-4 352M bench's B=32 pass costs ~351 ms on chip
(378.8 ms p50 minus the 27.3 ms same-run floor) vs a ~93-131 ms plane-read
DMA bound — this probe times the Pallas phase-1 kernel in isolation against
the full search program on the SAME store to attribute the gap between the
kernel's CSA/score loop and the word-granularity selection stage
(``parallel/sharded.py`` ``per_query_wordsel``).

All timings are device_get-synced (block_until_ready can return at enqueue
under the axon relay, CLAUDE.md CAUTION) with a same-run dispatch floor.

Usage: python tools/probe_fold_batch.py [--rows N] [--fold F] [--batch B]
       [--k 128] [--repeats 5]
"""

import argparse
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=352 * 1024 * 1024)
    ap.add_argument("--fold", type=int, default=4)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map as _shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map as _shard_map

    from gpusimilarity_tpu.ops import fold as fold_ops
    from gpusimilarity_tpu.ops.bitplane import query_plane_indices
    from gpusimilarity_tpu.ops.pallas_bitplane import (
        pallas_bitplane_phase1_batched,
    )
    from gpusimilarity_tpu.ops.scan import popcount_rows_np
    from gpusimilarity_tpu.parallel.mesh import make_mesh
    from gpusimilarity_tpu.parallel.sharded import (
        _bitplane_kernel_mc8,
        build_bitplane_search_fn,
    )
    from gpusimilarity_tpu.utils import synth

    mesh = make_mesh()
    n_shards = len(jax.devices())
    rows = synth.aligned_virtual_rows(args.rows, n_shards)
    t0 = time.monotonic()
    store = synth.build_virtual_bitplane_store(
        rows, args.fold, mesh=mesh, seed=args.seed
    )
    jax.device_get(store.popcounts[:1])
    print(f"store: {rows:,} rows fold-{args.fold} in {time.monotonic()-t0:.1f}s",
          flush=True)

    b = args.batch
    q_rows = synth.pick_query_rows(b, rows, args.fold, seed=args.seed)
    full_q = synth.virtual_rows_np(q_rows, seed=args.seed)
    folded_q = np.asarray(fold_ops.fold_words(full_q, args.fold))
    plane_idx, bucket = query_plane_indices(folded_q, store.bitcount, bucket=64)
    qpops = popcount_rows_np(folded_q).astype(np.int32)
    overfetch = fold_ops.overfetch_count(args.k, args.fold)
    k_fetch = min(max(128, 1 << (overfetch - 1).bit_length()), rows)

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
    print(f"dispatch floor: {floor*1e3:.1f} ms", flush=True)

    # ---- phase 1 alone (same shard_map shape as the search fn) ----------
    p = plane_idx.shape[1]
    mc8 = _bitplane_kernel_mc8(p)
    m8s = store.planes.shape[1] // n_shards
    while mc8 > 128 and m8s % mc8:
        mc8 //= 2

    def p1(planes, pops3, idx, qp, cut, ab, off):
        return pallas_bitplane_phase1_batched(
            planes, pops3, idx, qp, cut, ab, off,
            mc8=mc8, bw8=8, n_valid=store.n_valid, similarity="tanimoto",
            interpret=False,
        )

    mapped = _shard_map(
        lambda planes, pops3, idx, qp, cut, ab: p1(
            planes, pops3, idx, qp, cut, ab,
            jax.lax.axis_index(store.axis).astype(jnp.int32)
            * jnp.int32(store.n_padded // n_shards),
        ),
        mesh=mesh,
        in_specs=(P(None, store.axis), P(None, None, store.axis), P(), P(),
                  P(), P()),
        out_specs=(P(), P(), P(None, None, store.axis)),
        check_vma=False,
    )
    jp1 = jax.jit(mapped)
    a_idx = jnp.asarray(plane_idx)
    a_qp = jnp.asarray(qpops)
    a_cut = jnp.zeros(b, jnp.float32)
    a_ab = jnp.ones(2, jnp.float32)

    def run_p1():
        return jp1(store.planes, store.pops3, a_idx, a_qp, a_cut, a_ab)

    def fetch_p1(out):
        jax.device_get(out[0][:, :1])  # bmax slice: sync without moving colmax

    p1_ms, p1_compile = timeit(run_p1, fetch_p1, args.repeats)
    print(f"phase1 alone: {p1_ms*1e3:.1f} ms (compile {p1_compile:.1f}s) "
          f"-> onchip ~{(p1_ms-floor)*1e3:.1f} ms", flush=True)

    # ---- full search ------------------------------------------------------
    search = build_bitplane_search_fn(
        store, k=k_fetch, similarity="tanimoto", batch=b,
        plane_bucket=bucket, use_pallas=True,
    )

    def run_full():
        return search(a_idx, a_qp, a_cut, jnp.float32(1.0), jnp.float32(1.0))

    def fetch_full(out):
        jax.device_get((out[0], out[1]))

    full_ms, full_compile = timeit(run_full, fetch_full, args.repeats)
    print(f"full search: {full_ms*1e3:.1f} ms (compile {full_compile:.1f}s) "
          f"-> onchip ~{(full_ms-floor)*1e3:.1f} ms", flush=True)

    plane_bytes = b * p * (rows // 8)
    dma_bound_ms = plane_bytes / 700e9 * 1e3
    print(
        f"attribution: phase1 {max(0.0, (p1_ms-floor))*1e3:.1f} ms "
        f"(DMA bound at bucket width {dma_bound_ms:.1f} ms), "
        f"selection+merge ~{(full_ms-p1_ms)*1e3:.1f} ms "
        f"(k_fetch {k_fetch}, {b} queries)",
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Stage-by-stage timing of the word-granularity selection at fold sizes.

probe_fold_batch measured (fold-4 352M rows, B=32, k_fetch=2048): phase 1
155 ms on-chip vs a 135 ms DMA bound, selection+merge ~200 ms — selection
dominates. This probe times the selection chain's stages separately on
resident phase-1 outputs to attribute those 200 ms:

  s1: top_k over block maxima        (B, n_blocks=180224) -> 2048 blocks
  s2: + colmax gather + word top_k   flat 131072 -> 2048 words
  s3: + planes gather (P x k_words random word loads) + bit expand
      + column top_k                 (the full per_query_wordsel)

Also times jax.lax.approx_max_k on the same block-maxima input for
comparison (not exactness-safe as-is; informational).

Usage: python tools/probe_wordsel.py [--rows N] [--fold F] [--batch B]
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
    from gpusimilarity_tpu.ops.scan import similarity_from_counts
    from gpusimilarity_tpu.parallel.mesh import make_mesh
    from gpusimilarity_tpu.parallel.sharded import _bitplane_kernel_mc8
    from gpusimilarity_tpu.utils import synth

    mesh = make_mesh()
    n_shards = len(jax.devices())
    assert n_shards == 1, "single-chip probe"
    rows = synth.aligned_virtual_rows(args.rows, n_shards)
    store = synth.build_virtual_bitplane_store(
        rows, args.fold, mesh=mesh, seed=args.seed
    )
    jax.device_get(store.popcounts[:1])
    print(f"store ready: {rows:,} rows fold-{args.fold}", flush=True)

    b = args.batch
    q_rows = synth.pick_query_rows(b, rows, args.fold, seed=args.seed)
    full_q = synth.virtual_rows_np(q_rows, seed=args.seed)
    folded_q = np.asarray(fold_ops.fold_words(full_q, args.fold))
    plane_idx, bucket = query_plane_indices(folded_q, store.bitcount, bucket=64)
    qpops = popcount_rows_np(folded_q).astype(np.int32)
    overfetch = fold_ops.overfetch_count(args.k, args.fold)
    k_fetch = min(max(128, 1 << (overfetch - 1).bit_length()), rows)

    p = plane_idx.shape[1]
    mc8 = _bitplane_kernel_mc8(p)
    m8s = store.planes.shape[1]
    while mc8 > 128 and m8s % mc8:
        mc8 //= 2

    # ---- run phase 1 once, keep outputs resident -------------------------
    @jax.jit
    def p1(planes, pops3, idx, qp, cut, ab):
        return pallas_bitplane_phase1_batched(
            planes, pops3, idx, qp, cut, ab, jnp.int32(0),
            mc8=mc8, bw8=8, n_valid=store.n_valid, similarity="tanimoto",
        )

    a_idx = jnp.asarray(plane_idx)
    a_qp = jnp.asarray(qpops)
    a_cut = jnp.zeros(b, jnp.float32)
    a_ab = jnp.ones(2, jnp.float32)
    bmax, cnts, colmax = p1(
        store.planes, store.pops3, a_idx, a_qp, a_cut, a_ab
    )
    jax.device_get(bmax[:, :1])
    n_blocks = bmax.shape[1]
    k_blocks = min(k_fetch, n_blocks)
    bw8 = 8
    print(f"phase1 outputs resident: n_blocks={n_blocks}, k_fetch={k_fetch}",
          flush=True)

    def timeit(fn, fetch, reps=args.repeats):
        out = fn()
        fetch(out)
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            fetch(fn())
            ts.append(time.monotonic() - t0)
        return statistics.median(ts)

    trivial = jax.jit(lambda x: x + 1)
    tiny = jnp.zeros(8, jnp.float32)
    jax.device_get(trivial(tiny))
    floor = statistics.median(
        [timeit(lambda: trivial(tiny), jax.device_get, 1) for _ in range(7)]
    )
    print(f"dispatch floor: {floor*1e3:.1f} ms", flush=True)

    shifts = jnp.arange(32, dtype=jnp.uint32)
    pops = store.popcounts.astype(jnp.int32)

    # ---- stage 1: block top_k -------------------------------------------
    @jax.jit
    def s1(bmax_all):
        def f(q_bmax):
            _, selb = jax.lax.top_k(q_bmax, k_blocks)
            return jnp.sort(selb.astype(jnp.int32))
        return jax.vmap(f)(bmax_all)

    t = timeit(lambda: s1(bmax), lambda o: jax.device_get(o[:, :1]))
    print(f"s1 block top_k({n_blocks}->{k_blocks}): {t*1e3:.1f} ms "
          f"(onchip ~{(t-floor)*1e3:.1f})", flush=True)

    # ---- approx_max_k comparison ----------------------------------------
    @jax.jit
    def s1a(bmax_all):
        def f(q_bmax):
            v, i = jax.lax.approx_max_k(q_bmax, k_blocks)
            return i.astype(jnp.int32)
        return jax.vmap(f)(bmax_all)

    t = timeit(lambda: s1a(bmax), lambda o: jax.device_get(o[:, :1]))
    print(f"s1 approx_max_k({n_blocks}->{k_blocks}): {t*1e3:.1f} ms "
          f"(onchip ~{(t-floor)*1e3:.1f})", flush=True)

    # ---- stages 1+2: + word selection -----------------------------------
    @jax.jit
    def s12(bmax_all, colmax_all):
        def f(q_bmax, q_colmax):
            _, selb = jax.lax.top_k(q_bmax, k_blocks)
            selb = jnp.sort(selb.astype(jnp.int32))
            widx = selb[:, None] * bw8 + jnp.arange(bw8, dtype=jnp.int32)
            wmax = jnp.take(q_colmax, widx.reshape(-1), axis=1)
            flat = wmax.reshape(-1)
            k_words = min(k_fetch, flat.shape[0])
            _, wsel = jax.lax.top_k(flat, k_words)
            wsel = wsel.astype(jnp.int32)
            r_sel = wsel // (k_blocks * bw8)
            slot = wsel % (k_blocks * bw8)
            w_sel = selb[slot // bw8] * bw8 + slot % bw8
            return r_sel, w_sel
        return jax.vmap(f)(bmax_all, colmax_all)

    t12 = timeit(lambda: s12(bmax, colmax), lambda o: jax.device_get(o[0][:, :1]))
    print(f"s1+2 (+ colmax gather + word top_k): {t12*1e3:.1f} ms "
          f"(onchip ~{(t12-floor)*1e3:.1f})", flush=True)

    # ---- full wordsel: + planes gather + expand + column top_k ----------
    @jax.jit
    def s123(bmax_all, colmax_all, idx_all, qp_all):
        def f(q_bmax, q_colmax, qidx, qpop):
            _, selb = jax.lax.top_k(q_bmax, k_blocks)
            selb = jnp.sort(selb.astype(jnp.int32))
            widx = selb[:, None] * bw8 + jnp.arange(bw8, dtype=jnp.int32)
            wmax = jnp.take(q_colmax, widx.reshape(-1), axis=1)
            flat = wmax.reshape(-1)
            k_words = min(k_fetch, flat.shape[0])
            _, wsel = jax.lax.top_k(flat, k_words)
            wsel = wsel.astype(jnp.int32)
            r_sel = wsel // (k_blocks * bw8)
            slot = wsel % (k_blocks * bw8)
            w_sel = selb[slot // bw8] * bw8 + slot % bw8
            pw = store.planes[(8 * qidx)[:, None] + r_sel[None, :],
                              w_sel[None, :]]
            bits = ((pw[:, :, None] >> shifts) & jnp.uint32(1)).astype(jnp.int32)
            common = bits.sum(axis=0)
            cols = (
                32 * (r_sel * m8s + w_sel)[:, None]
                + jnp.arange(32, dtype=jnp.int32)[None, :]
            )
            col_pops = jnp.take(pops, cols.reshape(-1)).reshape(common.shape)
            s = similarity_from_counts(
                common, col_pops, qpop, "tanimoto", jnp.float32(1.0),
                jnp.float32(1.0),
            )
            kc = min(k_fetch, k_words * 32)
            v, pos = jax.lax.top_k(s.reshape(-1), kc)
            gi = jnp.take(cols.reshape(-1), pos.astype(jnp.int32))
            return v, gi
        return jax.vmap(f)(bmax_all, colmax_all, idx_all, qp_all)

    t123 = timeit(
        lambda: s123(bmax, colmax, a_idx, a_qp),
        lambda o: jax.device_get(o[0][:, :1]),
    )
    print(f"s1+2+3 (full wordsel): {t123*1e3:.1f} ms "
          f"(onchip ~{(t123-floor)*1e3:.1f})", flush=True)
    print(
        f"attribution: s1 blocks, s2 delta {(t12-floor)*1e3:.1f}, "
        f"s3 delta {(t123-t12)*1e3:.1f} ms", flush=True
    )


if __name__ == "__main__":
    main()

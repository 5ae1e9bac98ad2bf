import time, statistics
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BITS, N = 1024, 1<<25
M = N // 32          # words per plane
M8 = M // 8
planes8 = jax.jit(lambda k: jax.random.bits(k, ((BITS+1)*8, M8), dtype=jnp.uint32))(jax.random.key(0))
P = 64
idx = jnp.asarray(np.sort(np.random.default_rng(0).choice(BITS, P, replace=False)).astype(np.int32))

def t(name, f, *a):
    t0=time.monotonic(); float(np.asarray(f(*a)).ravel()[0]); c=time.monotonic()-t0
    ts=[]
    for _ in range(5):
        t0=time.monotonic(); float(np.asarray(f(*a)).ravel()[0]); ts.append(time.monotonic()-t0)
    print(f"{name}: p50={statistics.median(ts)*1e3:.1f}ms (compile {c:.0f}s)", flush=True)

from gpusimilarity_tpu.ops.bitplane import wallace_popcount_planes

@jax.jit
def csa_tile_aligned(planes8, idx):
    mc8 = 1<<13   # 8K sub-cols -> per-plane window (8, 8K) = 256KB, tile-aligned
    n_chunks = M8 // mc8
    def chunk(ci):
        rows = [jax.lax.dynamic_slice(planes8, (8*idx[p], ci*mc8), (8, mc8)) for p in range(P)]
        counters = wallace_popcount_planes(rows)
        acc = counters[0]
        for c2 in counters[1:]: acc = acc ^ c2
        return acc.sum(dtype=jnp.uint32)
    return jax.lax.map(chunk, jnp.arange(n_chunks, dtype=jnp.int32)).sum().astype(jnp.float32)
t("C3 tile-aligned (8,mc8) slices+CSA", csa_tile_aligned, planes8, idx)

@jax.jit
def csa_tile_full(planes8, idx):
    # same but with the full unpack+scores+maxima consumer
    mc8 = 1<<13
    n_chunks = M8 // mc8
    shifts = jnp.arange(32, dtype=jnp.uint32)
    def chunk(ci):
        rows = [jax.lax.dynamic_slice(planes8, (8*idx[p], ci*mc8), (8, mc8)) for p in range(P)]
        counters = wallace_popcount_planes(rows)
        total = jnp.zeros((8, mc8, 32), jnp.int32)
        for j, c2 in enumerate(counters):
            total = total + (((c2[..., None] >> shifts) & jnp.uint32(1)).astype(jnp.int32) << j)
        s = total.astype(jnp.float32) / 1024.0
        bmax = s.reshape(8, mc8 // 64, 64*32).max(axis=(0, 2))
        cnt = jnp.sum((s >= 0.5).astype(jnp.int32))
        return bmax, cnt
    bm, cnt = jax.lax.map(chunk, jnp.arange(n_chunks, dtype=jnp.int32))
    return bm.max() + cnt.sum().astype(jnp.float32)*0
t("D3 tile-aligned full phase1 (unpack+maxima)", csa_tile_full, planes8, idx)

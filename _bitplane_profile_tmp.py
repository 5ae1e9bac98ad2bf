import time, statistics, os
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gpusimilarity_tpu.ops.bitplane import wallace_popcount_planes, counters_to_counts

BITS, N = 1024, 1<<25
M = N // 32
planes = jax.jit(lambda k: jax.random.bits(k, (BITS+1, M), dtype=jnp.uint32))(jax.random.key(0))
P = 64
idx = jnp.asarray(np.sort(np.random.default_rng(0).choice(BITS, P, replace=False)).astype(np.int32))

def t(name, f, *a):
    t0=time.monotonic(); r=float(np.asarray(f(*a)).ravel()[0]); c=time.monotonic()-t0
    ts=[]
    for _ in range(5):
        t0=time.monotonic(); float(np.asarray(f(*a)).ravel()[0]); ts.append(time.monotonic()-t0)
    print(f"{name}: p50={statistics.median(ts)*1e3:.1f}ms (compile {c:.0f}s)", flush=True)

@jax.jit
def gather_only(planes, idx):
    return jnp.take(planes, idx, axis=0).sum(dtype=jnp.uint32).astype(jnp.float32)
t("A gather 64 rows (512MB) + sum", gather_only, planes, idx)

@jax.jit
def gather_csa(planes, idx):
    compact = jnp.take(planes, idx, axis=0)
    mc = 65536 // 32 * 8  # 16K words/chunk
    n_chunks = M // mc
    def chunk(ci):
        win = jax.lax.dynamic_slice(compact, (0, ci*mc), (P, mc))
        counters = wallace_popcount_planes([win[p] for p in range(P)])
        # cheap consume without unpack: xor-reduce counters
        acc = counters[0]
        for c2 in counters[1:]: acc = acc ^ c2
        return acc.sum(dtype=jnp.uint32)
    return jax.lax.map(chunk, jnp.arange(n_chunks, dtype=jnp.int32)).sum().astype(jnp.float32)
t("B gather+CSA (no unpack)", gather_csa, planes, idx)

@jax.jit
def gather_full(planes, idx):
    compact = jnp.take(planes, idx, axis=0)
    mc = 65536 // 32 * 8
    n_chunks = M // mc
    def chunk(ci):
        win = jax.lax.dynamic_slice(compact, (0, ci*mc), (P, mc))
        counters = wallace_popcount_planes([win[p] for p in range(P)])
        common = counters_to_counts(counters)  # (mc*32,)
        s = common.astype(jnp.float32) / 1024.0
        return s.reshape(-1, 2048).max(axis=-1)
    bm = jax.lax.map(chunk, jnp.arange(n_chunks, dtype=jnp.int32))
    return bm.max()
t("C gather+CSA+unpack+maxima", gather_full, planes, idx)

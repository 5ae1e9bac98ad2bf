import time, statistics
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BITS, N = 1024, 1<<25
M = N // 32
planes = jax.jit(lambda k: jax.random.bits(k, (BITS+1, M), dtype=jnp.uint32))(jax.random.key(0))
P = 64
idx = jnp.asarray(np.sort(np.random.default_rng(0).choice(BITS, P, replace=False)).astype(np.int32))

def t(name, f, *a):
    t0=time.monotonic(); float(np.asarray(f(*a)).ravel()[0]); c=time.monotonic()-t0
    ts=[]
    for _ in range(5):
        t0=time.monotonic(); float(np.asarray(f(*a)).ravel()[0]); ts.append(time.monotonic()-t0)
    print(f"{name}: p50={statistics.median(ts)*1e3:.1f}ms (compile {c:.0f}s)", flush=True)

@jax.jit
def gather_map(planes, idx):
    def one(pi):
        return jax.lax.dynamic_slice(planes, (pi, 0), (1, M))[0]
    compact = jax.lax.map(one, idx)          # (P, M)
    return compact.sum(dtype=jnp.uint32).astype(jnp.float32)
t("A2 gather via lax.map dyn-slice", gather_map, planes, idx)

@jax.jit
def no_gather_csa(planes, idx):
    # direct CSA over dynamic-sliced plane rows per chunk, never materializing compact
    mc = 1<<16
    n_chunks = M // mc
    from gpusimilarity_tpu.ops.bitplane import wallace_popcount_planes
    def chunk(ci):
        rows = [jax.lax.dynamic_slice(planes, (idx[p], ci*mc), (1, mc))[0] for p in range(P)]
        counters = wallace_popcount_planes(rows)
        acc = counters[0]
        for c2 in counters[1:]: acc = acc ^ c2
        return acc.sum(dtype=jnp.uint32)
    return jax.lax.map(chunk, jnp.arange(n_chunks, dtype=jnp.int32)).sum().astype(jnp.float32)
t("B2 per-chunk direct slices+CSA (mc=64K words)", no_gather_csa, planes, idx)

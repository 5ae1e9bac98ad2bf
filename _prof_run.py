import time, glob, os
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gpusimilarity_tpu.parallel.sharded import BitplaneStore, build_bitplane_search_fn
from gpusimilarity_tpu.parallel.mesh import make_mesh
from gpusimilarity_tpu.ops.bitplane import PLANE_BUCKETS

n_rows = 64*1024*1024; w=32; bitcount=1024; qpop=50
mesh = make_mesh()
m8 = n_rows // 256
planes = jax.jit(lambda k: jax.random.bits(k, ((bitcount+1)*8, m8), dtype=jnp.uint32))(jax.random.key(0))
pops = jax.jit(lambda: jnp.full((n_rows,), 512, jnp.int32))()
store = BitplaneStore(mesh=mesh, axis="shards", planes=planes, popcounts=pops,
                      n_valid=n_rows, chunk_cols=1<<21, bitcount=bitcount)
search = build_bitplane_search_fn(store, k=128, similarity="tanimoto", batch=1, plane_bucket=64)
rng = np.random.default_rng(1)
pi = np.full((1,64), bitcount, np.int32); pi[0,:qpop] = np.sort(rng.choice(bitcount, qpop, False))
args = (jnp.asarray(pi), jnp.asarray(np.full(1, qpop, np.int32)),
        jnp.asarray(np.zeros(1, np.float32)), jnp.float32(1), jnp.float32(1))
v,i,a = search(*args); v.block_until_ready()
with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(3):
        v,i,a = search(*args); v.block_until_ready()
print("trace files:", glob.glob("/tmp/jaxtrace/**/*", recursive=True)[:10])

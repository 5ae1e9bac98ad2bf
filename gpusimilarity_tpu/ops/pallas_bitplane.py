"""Pallas TPU kernel for phase 1 of the bit-sliced (bitplane) scan.

The XLA version (``parallel/sharded._bitplane_local_topk``) splits the
carry-save adder tree across several fusions with HBM round-trips between
them and relayouts for the counter unpack (profiled ~5 ms per 64M-row query,
~3.5x the traffic bound). This kernel keeps the whole per-chunk pipeline in
VMEM:

* the query's P set-bit plane windows are fetched with manually
  double-buffered async DMAs from a single HBM ref (dynamic plane rows; an
  earlier variant passed the planes array once per plane so Pallas could
  pipeline them, which made XLA materialize P copies of the library);
* the CSA tree runs on whole ``(8, mc8)`` registers;
* instead of unpacking bit-sliced counters into per-column integers (a
  rank-3 relayout), scoring iterates the 32 lane-bit positions: for each bit
  ``b`` the counter shift ``(c_j >> b) & 1`` rebuilds that bit-column's
  counts as another perfect ``(8, mc8)`` tile, scores it against the
  bit-rearranged popcount planes (``pops3``), and accumulates running
  per-word maxima and cutoff counts;
* per-word maxima stream out as tile-aligned blocks; the tiny block-max
  reduction runs outside the kernel (Mosaic cannot shape-cast (8, mc8) to
  (8, bpc, bw8)).

Layouts (see ``parallel/sharded.BitplaneStore``): plane sub-rows
``(8p + r, w)``; ``pops3[b, r, w] = pops[32*(r*M8s + w) + b]`` per shard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitplane import wallace_popcount_planes
from .scan import TANIMOTO

NEG_INF = float("-inf")


def _kernel(
    idx_ref,  # SMEM (P,): query plane indices (sentinel = bitcount)
    off_ref,  # SMEM (1,): shard's global column offset
    planes_ref,  # ANY/HBM ((bitcount+1)*8, M8s)
    pops3_ref,  # VMEM (32, 8, mc8) pipelined window
    qpop_ref,  # SMEM (1,)
    cutoff_ref,  # SMEM (1,)
    ab_ref,  # SMEM (2,)
    colmax_ref,  # out VMEM (8, mc8) per-word running maxima
    cnt_ref,  # out VMEM (1, 128) lane-accumulated counts
    scratch_ref,  # VMEM (2, P, 8, mc8) double-buffered plane windows
    sems,  # DMA sems (2, P)
    *,
    n_valid: int,
    p: int,
    m8s: int,
    n_chunks: int,
    similarity: str,
):
    mc8 = colmax_ref.shape[1]
    ci = pl.program_id(0)

    def start_fetch(slot, chunk_idx):
        for pi in range(p):
            pltpu.make_async_copy(
                planes_ref.at[pl.ds(8 * idx_ref[pi], 8),
                              pl.ds(chunk_idx * mc8, mc8)],
                scratch_ref.at[slot, pi],
                sems.at[slot, pi],
            ).start()

    def wait_fetch(slot, chunk_idx):
        for pi in range(p):
            pltpu.make_async_copy(
                planes_ref.at[pl.ds(8 * idx_ref[pi], 8),
                              pl.ds(chunk_idx * mc8, mc8)],
                scratch_ref.at[slot, pi],
                sems.at[slot, pi],
            ).wait()

    @pl.when(ci == 0)
    def _():
        cnt_ref[:, :] = jnp.zeros_like(cnt_ref)
        start_fetch(0, 0)

    @pl.when(ci + 1 < n_chunks)
    def _():
        start_fetch((ci + 1) % 2, ci + 1)

    wait_fetch(ci % 2, ci)
    slot = ci % 2

    counters = wallace_popcount_planes(
        [scratch_ref[slot, pi] for pi in range(p)]
    )

    qpop = qpop_ref[0].astype(jnp.float32)
    cutoff = cutoff_ref[0]
    alpha = ab_ref[0]
    beta = ab_ref[1]

    # global column of element (r, w) at lane-bit b:
    #   off + 32*(r*M8s + ci*mc8 + w) + b
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (8, mc8), 0)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (8, mc8), 1)
    col_base = off_ref[0] + 32 * (r_iota * m8s + ci * mc8 + w_iota)

    bmax = jnp.full((8, mc8), NEG_INF, dtype=jnp.float32)
    count = jnp.zeros((8, mc8), dtype=jnp.int32)
    for b in range(32):
        common = jnp.zeros((8, mc8), dtype=jnp.int32)
        for j, cj in enumerate(counters):
            common = common + (
                ((cj >> jnp.uint32(b)) & jnp.uint32(1)).astype(jnp.int32) << j
            )
        cf = common.astype(jnp.float32)
        pop = pops3_ref[b, :, :].astype(jnp.float32)
        if similarity == TANIMOTO:
            denom = qpop + pop - cf
        else:
            denom = alpha * (qpop - cf) + beta * (pop - cf) + cf
        s = jnp.where(denom > 0, cf / denom, 0.0)
        s = jnp.where((cf == denom) & (denom > 0), 1.0, s)
        s = jnp.where(col_base + b < n_valid, s, NEG_INF)
        bmax = jnp.maximum(bmax, s)
        count = count + (s >= cutoff).astype(jnp.int32)

    colmax_ref[:, :] = bmax
    cnt_total = jnp.sum(count, keepdims=False)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == (ci % 128)
    cnt_ref[:, :] += jnp.where(lane, cnt_total, 0)


@functools.partial(
    jax.jit,
    static_argnames=("mc8", "bw8", "n_valid", "similarity", "interpret"),
)
def pallas_bitplane_phase1(
    planes,  # uint32 ((bitcount+1)*8, M8s)
    pops3,  # int32 (32, 8, M8s)
    plane_idx,  # int32 (P,)
    query_pop,  # int32 scalar array
    cutoff,  # f32 scalar array
    alpha_beta,  # f32 (2,)
    shard_offset,  # i32 scalar
    *,
    mc8: int,
    bw8: int,
    n_valid: int,
    similarity: str = TANIMOTO,
    interpret: bool = False,
):
    """Returns (block_max f32[n_blocks], count i32[]) for ONE query."""
    n_rows, m8s = planes.shape
    p = plane_idx.shape[0]
    if m8s % mc8 or mc8 % bw8:
        raise ValueError(f"bad geometry (m8s={m8s}, mc8={mc8}, bw8={bw8})")
    n_chunks = m8s // mc8
    n_blocks = m8s // bw8

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # planes stay in HBM
            pl.BlockSpec(
                (32, 8, mc8), lambda i, idx, off: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # qpop
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cutoff
            pl.BlockSpec(memory_space=pltpu.SMEM),  # alpha/beta
        ],
        out_specs=[
            pl.BlockSpec(
                (8, mc8), lambda i, idx, off: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, p, 8, mc8), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, p)),
        ],
    )
    kernel = functools.partial(
        _kernel, n_valid=n_valid, p=p, m8s=m8s, n_chunks=n_chunks,
        similarity=similarity,
    )
    colmax, cnts = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, m8s), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(
        plane_idx,
        jnp.reshape(shard_offset.astype(jnp.int32), (1,)),
        planes,
        pops3,
        jnp.reshape(query_pop, (1,)).astype(jnp.int32),
        jnp.reshape(cutoff, (1,)).astype(jnp.float32),
        alpha_beta.astype(jnp.float32),
    )
    block_max = colmax.reshape(8, n_blocks, bw8).max(axis=(0, 2))
    return block_max, cnts.sum()


def build_pops3(pops_flat, n_shards: int):
    """Rearrange flat per-column popcounts into the kernel's bit-major layout.

    ``pops3[b, r, s*M8s + w] = pops[s*Ns + 32*(r*M8s + w) + b]`` so that a
    shard's window ``pops3[:, :, base8:base8+mc8]`` aligns with its plane
    windows. Works on numpy or jax arrays; returns (32, 8, M8_total).
    """
    n = pops_flat.shape[0]
    ns = n // n_shards
    m8s = ns // 256
    out = (
        pops_flat.reshape(n_shards, 8, m8s, 32)
        .transpose(3, 1, 0, 2)
        .reshape(32, 8, n_shards * m8s)
    )
    return out

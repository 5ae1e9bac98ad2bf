"""Pallas TPU kernel for phase 1 of the bit-sliced (bitplane) scan.

The XLA version (``parallel/sharded._bitplane_local_topk``) splits the
carry-save adder tree across several fusions with HBM round-trips between
them and relayouts for the counter unpack (profiled at ~5 ms per 64M-row
query, ~3.5x the traffic bound). This kernel keeps the whole per-chunk
pipeline in VMEM:

* the query's P set-bit plane windows are streamed by Pallas itself — the
  ``PrefetchScalarGridSpec`` index maps read the plane indices, so each of
  the P input specs pipelines ``(8, mc8)`` tile-aligned windows with
  automatic double-buffering (no gather, no manual DMA);
* the CSA tree runs on whole ``(8, mc8)`` registers;
* instead of unpacking bit-sliced counters into per-column integers (a
  rank-3 relayout), scoring iterates the 32 lane-bit positions: for each bit
  ``b`` the counter shift ``(c_j >> b) & 1`` rebuilds that bit-column's
  counts as another perfect ``(8, mc8)`` tile, scores it against the
  bit-rearranged popcount planes (``pops3``), and accumulates block maxima
  and cutoff counts with running reductions.

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
    *refs,
    n_valid: int,
    p: int,
    bw8: int,
    m8s: int,
    similarity: str,
):
    plane_refs = refs[:p]
    pops3_ref, qpop_ref, cutoff_ref, ab_ref, bmax_ref, cnt_ref = refs[p:]
    mc8 = plane_refs[0].shape[1]
    bpc = mc8 // bw8  # block-maxima written per chunk (must be 128-aligned)
    ci = pl.program_id(0)

    @pl.when(ci == 0)
    def _():
        cnt_ref[:, :] = jnp.zeros_like(cnt_ref)

    counters = wallace_popcount_planes([r[:, :] for r in plane_refs])

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

    # block b4 spans all 8 sub-rows x bw8 words x 32 bits
    block_maxima = jnp.max(bmax.reshape(8, bpc, bw8), axis=(0, 2))
    cnt_total = jnp.sum(count, keepdims=False)

    bmax_ref[:, pl.ds(pl.multiple_of(ci * bpc, 128), bpc)] = block_maxima.reshape(
        1, bpc
    )
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
    query_pop,  # int32 scalar array (1,)
    cutoff,  # f32 (1,)
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
    if m8s % mc8 or mc8 % bw8 or (mc8 // bw8) % 128:
        raise ValueError(
            f"need m8s % mc8 == 0, mc8 % bw8 == 0, mc8/bw8 % 128 == 0 "
            f"(m8s={m8s}, mc8={mc8}, bw8={bw8})"
        )
    n_chunks = m8s // mc8
    bpc = mc8 // bw8
    n_blocks = n_chunks * bpc

    def plane_spec(pi):
        return pl.BlockSpec(
            (8, mc8),
            lambda i, idx, off, pi=pi: (idx[pi], i),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[plane_spec(pi) for pi in range(p)]
        + [
            pl.BlockSpec(
                (32, 8, mc8), lambda i, idx, off: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # qpop
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cutoff
            pl.BlockSpec(memory_space=pltpu.SMEM),  # alpha/beta
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(
        _kernel, n_valid=n_valid, p=p, bw8=bw8, m8s=m8s, similarity=similarity
    )
    bmax, cnts = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_blocks), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(
        plane_idx,
        jnp.reshape(shard_offset.astype(jnp.int32), (1,)),
        *([planes] * p),
        pops3,
        jnp.reshape(query_pop, (1,)).astype(jnp.int32),
        jnp.reshape(cutoff, (1,)).astype(jnp.float32),
        alpha_beta.astype(jnp.float32),
    )
    return bmax[0], cnts.sum()


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

"""Pallas TPU kernel for phase 1 of the dense scan.

Fuses the whole per-chunk pipeline — AND + popcount over 32 packed word
planes, Tanimoto/Tversky scoring, validity masking, per-block maxima, and
cutoff-survivor counting — into one VMEM-resident kernel, with Pallas'
automatic HBM→VMEM double-buffering streaming the library. Output is only
``(B, n_blocks)`` maxima + ``(B, n_chunks)`` counts; scores never touch HBM.

This is the hand-scheduled counterpart of the XLA path in
``parallel/sharded._local_scan_topk`` (same math, same outputs — tested for
exact equality); the engine picks it with ``use_pallas=True``. On CPU it runs
in interpreter mode, so the test suite exercises it without a TPU.

Rebuilds the hot loop of the reference's ``TanimotoFunctor``
(``fingerprintdb_cuda.cu:76-104``) the TPU way: block-parallel over lanes
instead of thread-per-fingerprint, with selection folded into the scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan import TANIMOTO, TVERSKY, exact_div

NEG_INF = float("-inf")  # plain float: a jnp scalar would be captured as a
# constant inside the pallas kernel, which pallas_call rejects


def _phase1_kernel(
    off_ref,  # SMEM (1,): this shard's global column offset
    db_ref,  # VMEM (W, C) uint32 — one chunk of packed word-planes
    pops_ref,  # VMEM (C,) int16 (or int32); (1,) dummy when popless
    q_ref,  # VMEM (B, W) uint32
    qpops_ref,  # VMEM (B,) int32
    cutoff_ref,  # VMEM (B,) f32
    params_ref,  # SMEM (3,): alpha, beta, (unused)
    bmax_ref,  # out VMEM (B, n_blocks) f32 — full array, sliced per chunk
    cnt_ref,  # out VMEM (B, 128) i32 — lane-accumulated counts
    *,
    n_valid: int,
    block: int,
    similarity: str,
    popless: bool,
):
    w, c = db_ref.shape
    b = q_ref.shape[0]
    bpc = c // block  # must be a multiple of 128 (Mosaic store alignment)
    ci = pl.program_id(0)
    chunk_base = ci * c + off_ref[0]

    @pl.when(ci == 0)
    def _():
        cnt_ref[:, :] = jnp.zeros_like(cnt_ref)

    col_idx = chunk_base + jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    valid = col_idx < n_valid

    common = jnp.zeros((b, c), dtype=jnp.int32)
    dtot = jnp.zeros((1, c), dtype=jnp.int32) if popless else None
    for wi in range(w):
        plane = db_ref[wi, :][None, :]  # (1, C)
        qw = q_ref[:, wi][:, None]  # (B, 1)
        common = common + jax.lax.population_count(
            jnp.bitwise_and(plane, qw)
        ).astype(jnp.int32)
        if popless:
            # popless store: per-column popcounts recomputed from the
            # planes already in VMEM — shared across the query batch
            dtot = dtot + jax.lax.population_count(plane).astype(jnp.int32)

    cf = common.astype(jnp.float32)
    # int32 hop: Mosaic's sub-word int16->f32 cast support varies
    if popless:
        dpops = dtot.astype(jnp.float32)
    else:
        dpops = pops_ref[:][None, :].astype(jnp.int32).astype(jnp.float32)
    qpops = qpops_ref[:][:, None].astype(jnp.float32)
    if similarity == TANIMOTO:
        denom = qpops + dpops - cf
        # exact_div: TPU's native divide misrounds ~34% of these integer
        # quotients by 1 ulp, flipping cutoff counts and returned scores vs
        # the numpy/reference oracle (see scan.exact_div). denom == 0 only
        # when cf == 0, so max(denom, 1) never changes a real score.
        scores = jnp.where(
            denom > 0, exact_div(cf, jnp.maximum(denom, 1.0)), 0.0
        )
    else:  # TVERSKY
        alpha = params_ref[0]
        beta = params_ref[1]
        denom = alpha * (qpops - cf) + beta * (dpops - cf) + cf
        scores = jnp.where(denom > 0, cf / denom, 0.0)
    scores = jnp.where((cf == denom) & (denom > 0), 1.0, scores)
    scores = jnp.where(valid, scores, NEG_INF)

    count = jnp.sum(
        (scores >= cutoff_ref[:][:, None]).astype(jnp.int32),
        axis=-1, keepdims=True,
    )  # (B, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == (ci % 128)
    cnt_ref[:, :] += jnp.where(lane, count, 0)
    bmax_ref[:, pl.ds(pl.multiple_of(ci * bpc, 128), bpc)] = jnp.max(
        scores.reshape(b, bpc, block), axis=-1
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "block", "n_valid", "similarity", "popless", "interpret",
    ),
)
def pallas_phase1(
    db,  # uint32 (W, Ns) planar packed words
    pops,  # int16/int32 (Ns,); ignored ((1,) dummy) when popless
    queries,  # uint32 (B, W)
    query_pops,  # int32 (B,)
    cutoffs,  # f32 (B,)
    alpha,
    beta,
    shard_offset,  # i32 scalar: global column base of this shard
    *,
    chunk: int,
    block: int,
    n_valid: int,
    similarity: str = TANIMOTO,
    popless: bool = False,
    interpret: bool = False,
):
    """Returns (block_max f32[B, Ns/block], counts i32[B])."""
    w, n_shard = db.shape
    b = queries.shape[0]
    if n_shard % chunk or chunk % block:
        raise ValueError("chunk must divide the shard and block the chunk")
    n_chunks = n_shard // chunk
    bpc = chunk // block
    if bpc % 128:
        raise ValueError(
            f"chunk/block = {bpc} must be a multiple of 128 for aligned "
            "VMEM stores (e.g. chunk 65536 with block 512)"
        )

    off = jnp.reshape(shard_offset.astype(jnp.int32), (1,))
    params = jnp.stack(
        [jnp.float32(alpha), jnp.float32(beta), jnp.float32(0)]
    )

    kernel = functools.partial(
        _phase1_kernel, n_valid=n_valid, block=block, similarity=similarity,
        popless=popless,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # shard offset
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((w, chunk), lambda i, off: (0, i), memory_space=pltpu.VMEM),
            # popless: the (1,) dummy travels whole (no per-chunk slicing)
            pl.BlockSpec(memory_space=pltpu.VMEM)
            if popless
            else pl.BlockSpec((chunk,), lambda i, off: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # queries, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # query pops
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cutoffs
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
        ],
        out_specs=[
            # full-array blocks (any size is legal when it equals the array);
            # the kernel writes its chunk's slice each grid step
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
    )
    bmax, cnts = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, n_chunks * bpc), jnp.float32),
            jax.ShapeDtypeStruct((b, 128), jnp.int32),
        ],
        interpret=interpret,
    )(off, db, pops, queries, query_pops, cutoffs, params)
    return bmax, cnts.sum(axis=-1)

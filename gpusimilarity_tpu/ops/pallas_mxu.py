"""MXU dot-product reformulation of the Tanimoto scan (probe backend).

SURVEY.md names the int8 MXU reformulation ``popcount(a&b) = <bits(a),
bits(b)>`` as the designed alternative to the VPU popcount path
(reference scan kernel: /root/reference/fingerprintdb_cuda.cu:76-104).
This kernel implements it for the dense packed layout ``words (32, N)``
(one library fingerprint per column, 32 packed uint32 words each):

* per grid step a ``(32, mc)`` packed tile is pipelined into VMEM;
* the tile is unpacked ONCE per grid step into eight ``(128, mc)``
  bit tiles (word-major row order ``w*32 + b``) — this cost is
  batch-independent, which is the whole bet: the existing bitplane
  kernel's expansion/score loop runs per query, so for large B the
  one-time unpack + MXU matmuls against all B query bit-vectors can
  win;
* ``common = qbits @ bits`` on the MXU (int8 x int8 -> int32 when the
  backend supports it, else bfloat16 -> f32: counts <= 1024 are exact in
  both), then Tanimoto/Tversky scoring on the VPU and a per-block max
  reduction for the two-phase selection.

Outputs mirror ``pallas_scan``'s phase-1 contract: per-block score
maxima + cutoff survivor counts, so the same selection layer could sit
on top if the probe wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan import TANIMOTO, exact_div

NEG_INF = float("-inf")


def _kernel(
    off_ref,  # scalar-prefetch SMEM (1,): shard global column offset
    words_ref,  # VMEM (32, mc) packed library tile
    qbits_ref,  # VMEM (B, 1024) query bits (word-major w*32+b order)
    qmeta_ref,  # VMEM (B, 128) f32: col 0 = query popcount, col 1 = cutoff
    pops_ref,  # VMEM (1, mc) per-column popcounts
    ab_ref,  # SMEM (2,)
    bmax_ref,  # out VMEM (B, n_chunk_blocks) per-block maxima
    cnt_ref,  # out VMEM (B, 128) cutoff survivor counts (grid-resident)
    *,
    n_valid: int,
    mc: int,
    bw: int,
    b_total: int,
    similarity: str,
    acc_dtype,
):
    ci = pl.program_id(0)

    @pl.when(ci == 0)
    def _():
        cnt_ref[:, :] = jnp.zeros_like(cnt_ref)

    # Unpack + matmul in 8 groups of 4 packed words: each group expands
    # to a (128, mc) bit tile whose row 32*w_local + b holds bit b of word
    # w — global word-major order w*32 + b, matching query_bits_np — and
    # feeds the MXU at K=128 without ever materializing the whole
    # (1024, mc) bit matrix in VMEM. Casts route through int32 (Mosaic has
    # no uint32->bf16/int8 lowering).
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 32, 1), 1)
    common = None
    for g in range(8):
        rows = words_ref[4 * g:4 * g + 4, :]  # (4, mc) uint32
        bits01 = ((rows[:, None, :] >> shifts) & jnp.uint32(1)).astype(
            jnp.int32
        )  # (4, 32, mc)
        qg = qbits_ref[:, 128 * g:128 * (g + 1)]  # (B, 128) int8
        if acc_dtype == jnp.int8:
            bits = bits01.astype(jnp.int8).reshape(128, mc)
            part = jax.lax.dot_general(
                qg, bits, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        else:
            bits = bits01.astype(jnp.float32).astype(acc_dtype).reshape(
                128, mc
            )
            qgf = qg.astype(jnp.float32).astype(acc_dtype)
            part = jax.lax.dot_general(
                qgf, bits, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        common = part if common is None else common + part
    common = common.astype(jnp.float32)

    qpop = qmeta_ref[:, 0:1]  # (B, 1) f32
    pops = pops_ref[0, :].astype(jnp.float32)[None, :]  # (1, mc)
    if similarity == TANIMOTO:
        denom = qpop + pops - common
        # exact_div: the native divide misrounds ~34% of these integer
        # quotients 1 ulp low vs the numpy oracle (see scan.exact_div)
        s = exact_div(common, jnp.maximum(denom, 1.0))
    else:
        alpha = ab_ref[0]
        beta = ab_ref[1]
        denom = alpha * (qpop - common) + beta * (pops - common) + common
        s = jnp.where(denom > 0, common / jnp.maximum(denom, 1e-30), 0.0)
    # exact-1.0 pin (same as pallas_scan.py:80-82: reciprocal-multiply
    # division can yield c/c = 0.99999994)
    s = jnp.where((common == denom) & (denom > 0), 1.0, s)
    col = (
        off_ref[0]
        + ci * mc
        + jax.lax.broadcasted_iota(jnp.int32, (b_total, mc), 1)
    )
    s = jnp.where(col < n_valid, s, NEG_INF)

    cut = qmeta_ref[:, 1:2]  # (B, 1) f32
    cnt = jnp.sum((s >= cut).astype(jnp.int32), axis=1, keepdims=True)
    hit = (
        jax.lax.broadcasted_iota(jnp.int32, (b_total, 128), 1) == (ci % 128)
    )
    cnt_ref[:, :] += jnp.where(hit, cnt, 0)

    bmax_ref[:, :] = s.reshape(b_total, mc // bw, bw).max(axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("mc", "bw", "n_valid", "similarity", "int8_mxu",
                     "interpret"),
)
def mxu_scan_phase1(
    words,  # uint32 (32, N)
    pops,  # int (N,) per-column popcounts
    qbits,  # int8 (B, 1024) query bits, word-major order w*32+b
    query_pops,  # int32 (B,)
    cutoffs,  # f32 (B,)
    alpha_beta,  # f32 (2,)
    shard_offset,  # i32 scalar
    *,
    mc: int,
    bw: int,
    n_valid: int,
    similarity: str = TANIMOTO,
    int8_mxu: bool = True,
    interpret: bool = False,
):
    """Returns (block_max f32[B, N//bw], counts i32[B])."""
    w, n = words.shape
    b_total = qbits.shape[0]
    if w != 32 or qbits.shape[1] != 1024:
        raise ValueError("mxu_scan_phase1 is specialized to 1024-bit rows")
    if n % mc or mc % bw:
        raise ValueError(f"bad geometry (n={n}, mc={mc}, bw={bw})")
    if not interpret and (mc // bw) % 128:
        # Mosaic requires output block last dims divisible by (8, 128):
        # the per-chunk block-maxima tile is (b_total, mc // bw).
        raise ValueError(
            f"mc/bw={mc // bw} must be a multiple of 128 on TPU "
            f"(got mc={mc}, bw={bw})"
        )
    n_chunks = n // mc
    acc_dtype = jnp.int8 if int8_mxu else jnp.bfloat16

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((32, mc), lambda ci, off: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_total, 1024), lambda ci, off: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_total, 128), lambda ci, off: (0, 0),
                         memory_space=pltpu.VMEM),  # qmeta
            pl.BlockSpec((1, mc), lambda ci, off: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # alpha/beta
        ],
        out_specs=[
            pl.BlockSpec((b_total, mc // bw), lambda ci, off: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_total, 128), lambda ci, off: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(
        _kernel, n_valid=n_valid, mc=mc, bw=bw, b_total=b_total,
        similarity=similarity, acc_dtype=acc_dtype,
    )
    qmeta = jnp.zeros((b_total, 128), jnp.float32)
    qmeta = qmeta.at[:, 0].set(
        jnp.reshape(query_pops, (b_total,)).astype(jnp.float32)
    )
    qmeta = qmeta.at[:, 1].set(
        jnp.reshape(cutoffs, (b_total,)).astype(jnp.float32)
    )
    bmax, cnts = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b_total, n // bw), jnp.float32),
            jax.ShapeDtypeStruct((b_total, 128), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.reshape(shard_offset.astype(jnp.int32), (1,)),
        words,
        qbits.astype(jnp.int8),
        qmeta,
        pops.astype(jnp.int32).reshape(1, n),
        alpha_beta.astype(jnp.float32),
    )
    return bmax, cnts.sum(axis=-1)


def query_bits_np(queries):
    """Packed queries ``uint32 (B, 32)`` -> word-major int8 ``(B, 1024)``.

    Row order matches the kernel's grouped unpack: position ``w*32 + b``
    holds bit ``b`` of packed word ``w``.
    """
    import numpy as np

    b = queries.shape[0]
    bits = (
        (queries[:, :, None] >> np.arange(32, dtype=np.uint32)[None, None, :])
        & 1
    ).astype(np.int8)
    return bits.reshape(b, 1024)

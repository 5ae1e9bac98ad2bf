"""Pallas TPU kernel for phase 1 of the bit-sliced (bitplane) scan.

The XLA version (``parallel/sharded._bitplane_local_topk``) splits the
carry-save adder tree across several fusions with HBM round-trips between
them and relayouts for the counter unpack (profiled ~5 ms per 64M-row query,
~3.5x the traffic bound). This kernel keeps the whole per-chunk pipeline in
VMEM:

* a whole query batch runs in ONE kernel launch on a ``(n_chunks, B)`` grid
  (queries iterate fastest), so stripe DMAs for the next query prefetch
  while the current query computes and the pops3 window is fetched once per
  chunk and reused across all B queries — the round-1 version launched the
  kernel once per query under ``lax.map``;
* each query's P set-bit plane windows are fetched with manually
  double-buffered async DMAs from a single HBM ref (dynamic plane rows; an
  earlier variant passed the planes array once per plane so Pallas could
  pipeline them, which made XLA materialize P copies of the library);
* the CSA tree runs on whole ``(8, mc8)`` registers;
* instead of unpacking bit-sliced counters into per-column integers (a
  rank-3 relayout), scoring iterates the lane-bit positions in PAIRS
  (b, b+16): one right shift moves counter bit ``b`` to weight ``j`` and
  bit ``b+16`` to weight ``j+16`` simultaneously, so a single shift + one
  combined mask per counter rebuilds BOTH columns' counts packed in the
  16-bit halves of a perfect ``(8, mc8)`` uint32 tile (counts <= 1024
  always fit). Each half is scored against the bit-rearranged popcount
  planes (``pops3``) into running per-word maxima and cutoff counts.
  Tanimoto needs no division guard beyond ``maximum(denom, 1)``: the
  denominator is a non-negative integer and is zero only when the
  numerator is;
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
from .scan import TANIMOTO, exact_div

NEG_INF = float("-inf")


def _batched_kernel(
    idx_ref,  # SMEM (B, P): query plane indices (sentinel = bitcount)
    off_ref,  # SMEM (1,): shard's global column offset
    planes_ref,  # ANY/HBM ((bitcount+1)*8, M8s)
    pops3_ref,  # VMEM (32, 8, mc8) pipelined window (per chunk)
    qpop_ref,  # SMEM (B,)
    cutoff_ref,  # SMEM (B,)
    ab_ref,  # SMEM (2,)
    colmax_ref,  # out VMEM (1, 8, mc8) per-(query, chunk) word maxima
    cnt_ref,  # out VMEM (B, 128) lane-accumulated counts, grid-resident
    scratch_ref,  # VMEM (2, P, 8, mc8) double-buffered plane windows
    sems,  # DMA sems (2,) — one per buffer slot, shared by its P copies
    *,
    n_valid: int,
    p: int,
    b_total: int,
    m8s: int,
    n_chunks: int,
    similarity: str,
):
    mc8 = colmax_ref.shape[2]
    ci = pl.program_id(0)
    qb = pl.program_id(1)
    step = ci * b_total + qb

    # all p plane copies of a slot share ONE counting semaphore: the
    # consumer always waits for the whole slot before touching any plane,
    # so per-plane semaphores buy nothing — and at plane bucket 256 a
    # (2, p) semaphore array is 2 KiB of sflag, exactly this chip's entire
    # scoped-semaphore budget (first 104M-row server boot failed its
    # bucket-256 warmup compile with "Ran out of memory in memory space
    # sflag. Used 2.1K of 2.0K").
    def start_fetch(slot, chunk_idx, b_idx):
        for pi in range(p):
            pltpu.make_async_copy(
                planes_ref.at[pl.ds(8 * idx_ref[b_idx, pi], 8),
                              pl.ds(chunk_idx * mc8, mc8)],
                scratch_ref.at[slot, pi],
                sems.at[slot],
            ).start()

    def wait_fetch(slot, chunk_idx, b_idx):
        for pi in range(p):
            pltpu.make_async_copy(
                planes_ref.at[pl.ds(8 * idx_ref[b_idx, pi], 8),
                              pl.ds(chunk_idx * mc8, mc8)],
                scratch_ref.at[slot, pi],
                sems.at[slot],
            ).wait()

    @pl.when(step == 0)
    def _():
        cnt_ref[:, :] = jnp.zeros_like(cnt_ref)
        start_fetch(0, 0, 0)

    nxt = step + 1

    @pl.when(nxt < n_chunks * b_total)
    def _():
        start_fetch(nxt % 2, nxt // b_total, nxt % b_total)

    wait_fetch(step % 2, ci, qb)
    slot = step % 2

    counters = wallace_popcount_planes(
        [scratch_ref[slot, pi] for pi in range(p)]
    )

    qpop_i = qpop_ref[qb]
    qpop = qpop_i.astype(jnp.float32)
    cutoff = cutoff_ref[qb]
    alpha = ab_ref[0]
    beta = ab_ref[1]

    # global column of element (r, w) at lane-bit b:
    #   off + 32*(r*M8s + ci*mc8 + w) + b
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (8, mc8), 0)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (8, mc8), 1)
    col_base = off_ref[0] + 32 * (r_iota * m8s + ci * mc8 + w_iota)
    # hoisted validity limit: lane-bit b is a real column iff b < vlim
    vlim = n_valid - col_base

    # Packed-field reconstruction of lane-bit columns. A counter bit at
    # position j must move to field-local weight j for every lane-bit
    # column packed in the same uint32: columns {b, b+F, b+2F, ...} all
    # move by the same distance (b-j), so ONE shift plus one combined mask
    # per counter rebuilds all 32/F columns' counts at once as F-bit
    # fields. F=16 (counts <= 1024 < 2**16 — PLANE_BUCKETS caps the addend
    # count) near-halves the per-bit loop; F=8 (legal whenever the plane
    # bucket p <= 255, i.e. every count fits a byte and the counter list
    # has <= 8 entries) halves it again for the hot Morgan buckets 16-128.
    field = 8 if (p <= 255 and len(counters) <= 8) else 16
    offs = tuple(range(0, 32, field))
    fmask = jnp.uint32((1 << field) - 1)

    def columns():
        """Yields (cf int32 (8, mc8), lane-bit index) for all 32 columns."""
        for b in range(field):
            merged = jnp.zeros((8, mc8), dtype=jnp.uint32)
            for j, cj in enumerate(counters):
                m = jnp.uint32(sum(1 << (j + o) for o in offs))
                if b >= j:
                    merged = merged | ((cj >> jnp.uint32(b - j)) & m)
                else:
                    merged = merged | ((cj << jnp.uint32(j - b)) & m)
            for o in offs:
                # Mosaic has no uint32->f32 cast; the int32 hop is a free
                # bitcast (every field is < 2**len(counters)); the top
                # field needs no mask
                fv = merged >> jnp.uint32(o) if o else merged
                if o != 32 - field:
                    fv = fv & fmask
                yield fv.astype(jnp.int32), b + o

    def write_cnt(cnt_total):
        hit = (
            jax.lax.broadcasted_iota(jnp.int32, (b_total, 128), 0) == qb
        ) & (
            jax.lax.broadcasted_iota(jnp.int32, (b_total, 128), 1)
            == (ci % 128)
        )
        cnt_ref[:, :] += jnp.where(hit, cnt_total, 0)

    def score_div():
        """Per-column division scoring (any cutoff, any similarity).

        The cutoff count must test ``fl(cf/denom) >= cutoff`` — the exact
        value the engine's pinned paths (scan.similarity_from_counts,
        pallas_scan) and the reference's golden cutoff tables see — so a
        positive cutoff forces the division per column."""

        def score_one(cf, bb, bmax, count):
            pop = pops3_ref[bb, :, :].astype(jnp.float32)
            if similarity == TANIMOTO:
                # denom is a non-negative integer and is 0 only when cf is
                # 0 (common <= min(qpop, pop)), so max(denom, 1) never
                # changes a real score and avoids 0/0 for padded queries.
                # exact_div: the native divide misrounds ~34% of these
                # integer quotients 1 ulp low, flipping the cutoff count at
                # boundary fractions (see scan.exact_div).
                denom = qpop + pop - cf
                s = exact_div(cf, jnp.maximum(denom, 1.0))
            else:
                denom = alpha * (qpop - cf) + beta * (pop - cf) + cf
                s = jnp.where(denom > 0, cf / jnp.maximum(denom, 1e-30), 0.0)
            # a self-match must score exactly 1.0 or cutoff=1.0 counts
            # diverge from the pinned paths — same pin as scan.py (exact_div
            # already guarantees it for Tanimoto; load-bearing for Tversky)
            s = jnp.where((cf == denom) & (denom > 0), 1.0, s)
            s = jnp.where(bb < vlim, s, NEG_INF)
            return jnp.maximum(bmax, s), count + (s >= cutoff).astype(
                jnp.int32
            )

        bmax = jnp.full((8, mc8), NEG_INF, dtype=jnp.float32)
        count = jnp.zeros((8, mc8), dtype=jnp.int32)
        for cf, bb in columns():
            bmax, count = score_one(cf.astype(jnp.float32), bb, bmax, count)
        colmax_ref[0, :, :] = bmax
        write_cnt(jnp.sum(count, keepdims=False))

    def score_rational():
        """Integer cross-multiplied running max — no per-column division.

        Tanimoto scores are rationals cf/denom with cf <= 1024 and
        denom <= 2048, so ``cf_new * den_max > num_max * den_new`` compares
        them exactly in int32 (products < 2**21). ONE division per chunk at
        the end replaces 32, and it is a correctly-rounded exact_div:
        correct rounding is monotone, so
        ``fl(max_i cf_i/den_i) == max_i fl(cf_i/den_i)`` and the emitted
        colmax is bit-identical to the per-column path, including the
        self-match 1.0 pin (applied to the winning column's cf == denom).
        Only legal when every valid score clears the cutoff (cutoff <= 0:
        scores are >= 0), because then the count is just the number of
        valid columns — ``sum(clamp(vlim, 0, 32))`` — and never needs a
        rounded score."""
        nmax = jnp.full((8, mc8), -1, dtype=jnp.int32)
        dmax = jnp.ones((8, mc8), dtype=jnp.int32)
        for cf, bb in columns():
            pop = pops3_ref[bb, :, :].astype(jnp.int32)
            den = qpop_i + pop - cf
            # den == 0 only when cf == 0 (score 0 either way); clamping
            # keeps a selected zero denominator from sticking as the
            # incumbent (0 > nmax*0 never fires again)
            den = jnp.maximum(den, 1)
            cfv = jnp.where(bb < vlim, cf, -1)
            upd = cfv * dmax > nmax * den
            nmax = jnp.where(upd, cfv, nmax)
            dmax = jnp.where(upd, den, dmax)
        s = exact_div(nmax.astype(jnp.float32), dmax.astype(jnp.float32))
        s = jnp.where(nmax == dmax, 1.0, s)  # dmax >= 1 always
        s = jnp.where(nmax < 0, NEG_INF, s)  # no valid column in the word
        colmax_ref[0, :, :] = s
        write_cnt(jnp.sum(jnp.clip(vlim, 0, 32), keepdims=False))

    if similarity == TANIMOTO:
        # both branches live in the compiled program; the SMEM scalar picks
        # one at run time per (chunk, query) step
        pl.when(cutoff > 0.0)(score_div)
        pl.when(cutoff <= 0.0)(score_rational)
    else:
        score_div()


@functools.partial(
    jax.jit,
    static_argnames=("mc8", "bw8", "n_valid", "similarity", "interpret"),
)
def pallas_bitplane_phase1_batched(
    planes,  # uint32 ((bitcount+1)*8, M8s)
    pops3,  # int32 (32, 8, M8s)
    plane_idx,  # int32 (B, P)
    query_pops,  # int32 (B,)
    cutoffs,  # f32 (B,)
    alpha_beta,  # f32 (2,)
    shard_offset,  # i32 scalar
    *,
    mc8: int,
    bw8: int,
    n_valid: int,
    similarity: str = TANIMOTO,
    interpret: bool = False,
):
    """Returns (block_max f32[B, n_blocks], counts i32[B],
    colmax f32[B, 8, M8s]) for a batch.

    ``colmax[b, r, w]`` is query b's max score over the 32 columns of
    sub-row r, word w — the selection layer uses it to pick top-k *words*
    within the selected blocks, so the exact rescore touches k words x 32
    columns instead of re-scanning whole blocks."""
    n_rows, m8s = planes.shape
    b_total, p = plane_idx.shape
    if m8s % mc8 or mc8 % bw8:
        raise ValueError(f"bad geometry (m8s={m8s}, mc8={mc8}, bw8={bw8})")
    n_chunks = m8s // mc8
    n_blocks = m8s // bw8

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks, b_total),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # planes stay in HBM
            pl.BlockSpec(
                (32, 8, mc8), lambda ci, qb, idx, off: (0, 0, ci),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # qpops
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cutoffs
            pl.BlockSpec(memory_space=pltpu.SMEM),  # alpha/beta
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 8, mc8), lambda ci, qb, idx, off: (qb, 0, ci),
                memory_space=pltpu.VMEM,
            ),
            # grid-resident accumulator: every step revisits the same block
            pl.BlockSpec(
                (b_total, 128), lambda ci, qb, idx, off: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, p, 8, mc8), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _batched_kernel, n_valid=n_valid, p=p, b_total=b_total, m8s=m8s,
        n_chunks=n_chunks, similarity=similarity,
    )
    colmax, cnts = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b_total, 8, m8s), jnp.float32),
            jax.ShapeDtypeStruct((b_total, 128), jnp.int32),
        ],
        interpret=interpret,
    )(
        plane_idx,
        jnp.reshape(shard_offset.astype(jnp.int32), (1,)),
        planes,
        pops3,
        jnp.reshape(query_pops, (b_total,)).astype(jnp.int32),
        jnp.reshape(cutoffs, (b_total,)).astype(jnp.float32),
        alpha_beta.astype(jnp.float32),
    )
    block_max = colmax.reshape(b_total, 8, n_blocks, bw8).max(axis=(1, 3))
    return block_max, cnts.sum(axis=-1), colmax


def pallas_bitplane_phase1(
    planes,
    pops3,
    plane_idx,  # int32 (P,)
    query_pop,  # int32 scalar array
    cutoff,  # f32 scalar array
    alpha_beta,
    shard_offset,
    *,
    mc8: int,
    bw8: int,
    n_valid: int,
    similarity: str = TANIMOTO,
    interpret: bool = False,
):
    """Single-query wrapper: returns (block_max f32[n_blocks], count i32[])."""
    block_max, cnts, _ = pallas_bitplane_phase1_batched(
        planes, pops3, plane_idx[None, :],
        jnp.reshape(query_pop, (1,)), jnp.reshape(cutoff, (1,)),
        alpha_beta, shard_offset,
        mc8=mc8, bw8=bw8, n_valid=n_valid, similarity=similarity,
        interpret=interpret,
    )
    return block_max[0], cnts[0]


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

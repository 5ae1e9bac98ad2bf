"""Deterministic *virtual* fingerprint libraries for benchmarks and scale tests.

A virtual library row is a pure function of its row index through a
counter-based 32-bit mixer, so the SAME data can be materialized
independently:

* on the **device**: folded and bit-transposed at hundreds of millions of
  rows, generated directly in HBM by an SPMD pass (no host materialization,
  no multi-GB upload through the dispatch relay);
* on the **host**: full-width — in bulk via the native fill
  (``native.synth_fill``) or lazily per-row — for the folded-search rescore
  and oracle checks.

This is what lets ``bench.py``'s fold mode measure the reference's own
baseline configuration — a library larger than device memory scanned folded
with an exact full-width re-score (reference ``README.md:13``: 1B rows on
4x16 GB V100s = a folded config; fold path ``fingerprintdb_cuda.cu:284-331``)
— without an hours-long upload.

The library is **clustered** like a real chemical corpus: rows come in
256-row clusters sharing a sparse core pattern, each row keeping ~75% of the
core's bits plus its own individual bits. A query (itself a library row)
therefore has ~255 graded neighbors in the 0.2-0.4 Tanimoto band over a
~0.02 noise floor — the regime the reference's fold over-fetch rule was
validated in (its published fold-accuracy table is measured on real corpora,
presentation slide 11; uniformly random rows are the documented adversarial
case where NO over-fetch can recover a tied noise tail, see
``tools/fold_accuracy.py --data random``). Overall density lands at ~4%
(~40 of 1024 bits), matching real Morgan fingerprints (~30-60 set bits);
fold-4 queries select ~37 of 256 planes — inside the 64-plane kernel bucket.

The mixer is the public-domain ``lowbias32`` (Wellons); statistical
perfection is irrelevant here — determinism and host/device/native
bit-identity are what the exactness checks pin (``tests/test_synth.py``).
All arithmetic stays in uint32 on BOTH sides: the TPU has no int64, so any
64-bit intermediate would silently diverge between numpy and jnp.
"""

from __future__ import annotations

import numpy as np

#: rows per cluster (shared sparse core pattern)
CLUSTER_ROWS = 256
#: mixer draws per 32-bit word: one (a, b) pair each for cluster and row
NUM_DRAWS = 2

_GOLD = 0x9E3779B9  # 2^32 / golden ratio: decorrelates sequential counters


def _mix32(h):
    """lowbias32: a well-avalanched bijective 32-bit mixer.

    Works on numpy OR jax uint32 arrays (operators only; constants are
    dtype-pinned so numpy does not upcast and jax does not weak-type).
    """
    c1, c2 = np.uint32(0x7FEB352D), np.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    h = h * c1
    h = h ^ (h >> 15)
    h = h * c2
    return h ^ (h >> 16)


def _seed_consts(seed: int):
    s_row = np.uint32((seed * _GOLD + 0x85EBCA6B) & 0xFFFFFFFF)
    s_clu = np.uint32((seed * _GOLD + 0xC2B2AE35) & 0xFFFFFFFF)
    return s_row, s_clu


def _ror(x, r: int):
    """Rotate uint32 lanes right by a static r (numpy or jnp)."""
    return (x >> np.uint32(r)) | (x << np.uint32(32 - r))


def _combine_words(ca, cb, ra, rb):
    """Sparse-word construction from two cluster and two row draws.

    Rotation self-products make 5/6-term AND densities out of single
    draws, keeping the per-word mixer count at 4 (2 cached per cluster)
    — the rescore path recomputes candidate rows on the fly and the
    measured host here executes only ~0.3-1 Gops/s, so every mix counts::

        core  = ca & ror(ca,7) & ror(ca,15) & cb & ror(cb,11)   (~3.1%)
        keep  = ra | ror(ra,13)                                  (75%)
        indiv = rb & ror(rb,3) & ror(rb,6) & ror(rb,12)
                   & ror(rb,17) & ror(rb,24)                     (~1.6%)
        word  = (core & keep) | indiv                            (~3.9%)
    """
    core = ca & _ror(ca, 7) & _ror(ca, 15) & cb & _ror(cb, 11)
    keep = ra | _ror(ra, 13)
    indiv = (
        rb & _ror(rb, 3) & _ror(rb, 6) & _ror(rb, 12)
        & _ror(rb, 17) & _ror(rb, 24)
    )
    return (core & keep) | indiv


def _virtual_words(idx, word_count: int, seed: int, xp):
    """Shared host/device row materialization on a uint32 index array.

    Per word ``w`` of row ``i`` (cluster ``c = i >> 8``), draws
    ``a = mix32(h + 2w * GOLD)``, ``b = mix32(h + (2w+1) * GOLD)`` are
    taken over the per-row base ``mix32(i ^ s_row)`` and per-cluster base
    ``mix32(c ^ s_clu)`` and combined by :func:`_combine_words` into a
    ~4%-dense word (~40 of 1024 bits, Morgan-like).

    Native twin: ``tsn_synth_fill`` / ``tsn_synth_rescore``
    (``native/tpusim_native.cpp``) — any change here must change there
    too, and vice versa.
    """
    s_row, s_clu = _seed_consts(seed)
    hr = _mix32(idx ^ s_row)[:, None]
    hc = _mix32((idx >> 8) ^ s_clu)[:, None]
    k = idx.shape[0]
    wd = xp.arange(word_count * NUM_DRAWS, dtype=xp.uint32) * xp.uint32(_GOLD)
    dc = _mix32(hc + wd[None, :]).reshape(k, word_count, NUM_DRAWS)
    dr = _mix32(hr + wd[None, :]).reshape(k, word_count, NUM_DRAWS)
    return _combine_words(dc[..., 0], dc[..., 1], dr[..., 0], dr[..., 1])


def virtual_rows_np(idx, word_count: int = 32, seed: int = 0) -> np.ndarray:
    """Full-width packed words ``uint32 (K, word_count)`` of rows ``idx``.

    The host half of the virtual library: bit-identical to what
    :func:`build_virtual_bitplane_store` folded onto the device.
    """
    idx = np.asarray(idx)
    if idx.ndim != 1:
        raise ValueError("idx must be 1-D")
    return _virtual_words(idx.astype(np.uint32), word_count, seed, np)


def _virtual_rows_jnp(row0, n: int, word_count: int, seed: int):
    """Device half: rows ``[row0, row0 + n)`` as ``uint32 (n, word_count)``.

    ``row0`` may be traced (shard offset + chunk offset). Must stay
    op-for-op identical to :func:`virtual_rows_np`.
    """
    import jax.numpy as jnp

    idx = row0.astype(jnp.uint32) + jnp.arange(n, dtype=jnp.uint32)
    return _virtual_words(idx, word_count, seed, jnp)


def aligned_virtual_rows(
    n: int, n_shards: int, with_pops3: bool = True
) -> int:
    """Largest row count <= ``n`` meeting the bitplane store's alignment.

    Per shard the Pallas kernel needs 262144-column alignment (1024
    sub-words; ``sharded.build_bitplane_store``), the XLA path 8192.
    """
    align = (262144 if with_pops3 else 8192) * n_shards
    return max(align, (n // align) * align)


def build_virtual_bitplane_store(
    n_rows: int,
    fold_factor: int,
    mesh=None,
    axis: str | None = None,
    word_count: int = 32,
    seed: int = 0,
    with_pops3: bool = True,
    row_chunk: int = 1 << 17,
):
    """Generate the folded, bit-transposed virtual library directly in HBM.

    One SPMD pass (``shard_map`` over the mesh): each shard iterates its
    own global row range in chunks, computes full-width words from the
    counter mixer, OR-folds them (``ops/fold.py`` word-level fold,
    reference ``calculation_functors.cpp:22-41``), bit-transposes the
    folded rows into the tile-aligned sub-row plane layout of
    :class:`~gpusimilarity_tpu.parallel.sharded.BitplaneStore`, and
    accumulates folded popcounts (flat int16 + the kernel's bit-major
    int32 ``pops3``). Peak transient HBM is O(row_chunk); the only large
    allocations are the store arrays themselves.

    ``n_rows`` must satisfy :func:`aligned_virtual_rows`.
    """
    import jax
    import jax.numpy as jnp

    from ..parallel.mesh import SHARD_AXIS, make_mesh
    from ..parallel.sharded import BITPLANE_CHUNK_COLS, BitplaneStore

    try:
        from jax import shard_map as _shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _shard_map
    from jax.sharding import PartitionSpec as P

    axis = axis or SHARD_AXIS
    if mesh is None:
        mesh = make_mesh(axis=axis)
    n_shards = mesh.shape[axis]
    if n_rows != aligned_virtual_rows(n_rows, n_shards, with_pops3):
        raise ValueError(
            f"n_rows {n_rows} unaligned; use aligned_virtual_rows()"
        )
    if word_count % fold_factor:
        raise ValueError("fold factor must divide the word count")
    wf = word_count // fold_factor
    bitcount_f = wf * 32
    ns = n_rows // n_shards  # rows per shard
    m8s = ns // 256  # sub-row words per shard
    sub_rows = ns // 8  # rows per sub-row segment
    chunk = min(row_chunk, sub_rows)
    while sub_rows % chunk:
        chunk //= 2
    chunk = max(32, chunk)
    n_chunks = ns // chunk
    cps = sub_rows // chunk  # chunks per sub-row segment
    shifts = jnp.arange(32, dtype=jnp.uint32)

    def gen_shard():
        s = jax.lax.axis_index(axis).astype(jnp.uint32)
        row_base = s * jnp.uint32(ns)
        planes0 = jnp.zeros((bitcount_f + 1, 8, m8s), jnp.uint32)
        pops0 = jnp.zeros((ns,), jnp.int16)
        pops3_0 = jnp.zeros((32, 8, m8s), jnp.int32)

        def body(ci, carry):
            planes, pops, pops3 = carry
            loc0 = ci * chunk
            r_sub = ci // cps
            w_off = (ci % cps) * (chunk // 32)
            full = _virtual_rows_jnp(
                row_base + loc0.astype(jnp.uint32), chunk, word_count, seed
            )  # (chunk, W)
            folded = jnp.bitwise_or.reduce(
                full.reshape(chunk, fold_factor, wf), axis=1
            )  # (chunk, wf)
            rp = jnp.sum(
                jax.lax.population_count(folded).astype(jnp.int32), axis=1
            )  # (chunk,)
            # bit-transpose: plane word j of the chunk packs rows 32j..32j+31
            bits = (folded[:, :, None] >> shifts) & jnp.uint32(1)
            pw = jnp.sum(  # disjoint set bits: sum == OR
                bits.reshape(chunk // 32, 32, bitcount_f)
                << shifts[None, :, None],
                axis=1,
                dtype=jnp.uint32,
            )  # (chunk//32, bitcount_f)
            planes = jax.lax.dynamic_update_slice(
                planes, pw.T[:, None, :], (0, r_sub, w_off)
            )
            pops = jax.lax.dynamic_update_slice(
                pops, rp.astype(jnp.int16), (loc0,)
            )
            pops3 = jax.lax.dynamic_update_slice(
                pops3,
                rp.reshape(chunk // 32, 32).T[:, None, :],
                (0, r_sub, w_off),
            )
            return planes, pops, pops3

        planes, pops, pops3 = jax.lax.fori_loop(
            0, n_chunks, body, (planes0, pops0, pops3_0)
        )
        return planes.reshape((bitcount_f + 1) * 8, m8s), pops, pops3

    mapped = _shard_map(
        gen_shard,
        mesh=mesh,
        in_specs=(),
        out_specs=(P(None, axis), P(axis), P(None, None, axis)),
        check_vma=False,
    )
    planes, pops, pops3 = jax.jit(mapped)()
    return BitplaneStore(
        mesh=mesh,
        axis=axis,
        planes=planes,
        popcounts=pops,
        n_valid=n_rows,
        chunk_cols=min(BITPLANE_CHUNK_COLS, ns),
        bitcount=bitcount_f,
        pops3=pops3 if with_pops3 else None,
    )


class VirtualWords:
    """Lazy ``uint32 (count, W)`` face of a virtual library.

    Drop-in for the engine's host-side full-width matrix (the fold-mode
    exact-rescore source, ``models/fingerprint_db.py``) when the library is
    counter-mixer generated: rows materialize on demand from their indices,
    so a 1.024B-row x 128 B full-width matrix (122 GB — larger than this
    host's disk, let alone its page cache) needs zero storage. The serve-
    time contract the engine uses: ``shape``/``nbytes``/``dtype``,
    ``__getitem__`` (int / slice / index array), and :meth:`rescore`.
    """

    __slots__ = ("shape", "seed")
    dtype = np.dtype(np.uint32)

    def __init__(self, count: int, word_count: int = 32, seed: int = 0):
        self.shape = (int(count), int(word_count))
        self.seed = int(seed)

    @property
    def nbytes(self) -> int:
        return self.shape[0] * self.shape[1] * 4

    def __len__(self) -> int:
        return self.shape[0]

    def __getitem__(self, key):
        n, w = self.shape
        if isinstance(key, (int, np.integer)):
            i = int(key)
            if i < 0:
                i += n
            if not 0 <= i < n:
                raise IndexError(f"row {key} out of range [0, {n})")
            return virtual_rows_np(
                np.array([i]), word_count=w, seed=self.seed
            )[0]
        if isinstance(key, slice):
            start, stop, step = key.indices(n)
            if step == 1 and stop - start >= 1024:
                try:
                    from . import native

                    return native.synth_fill(
                        stop - start, w, seed=self.seed, row0=start
                    )
                except ImportError:
                    pass
            idx = np.arange(start, stop, step, dtype=np.int64)
        else:
            idx = np.asarray(key)
            if idx.ndim != 1:
                raise TypeError(
                    "VirtualWords supports int / slice / 1-D index arrays"
                )
            if idx.size and (idx.min() < -n or idx.max() >= n):
                raise IndexError("row indices out of range")
            idx = np.where(idx < 0, idx + n, idx).astype(np.int64)
        return virtual_rows_np(idx, word_count=w, seed=self.seed)

    def rescore(self, indices, query_full, similarity="tanimoto",
                alpha: float = 1.0, beta: float = 1.0) -> np.ndarray:
        """Exact full-width scores of rows ``indices`` against ``query_full``
        — the virtual counterpart of ``native.rescore`` over an mmap."""
        indices = np.asarray(indices, dtype=np.int64)
        try:
            from . import native

            return native.synth_rescore(
                indices, np.asarray(query_full, np.uint32), seed=self.seed,
                alpha=alpha, beta=beta, tversky=similarity != "tanimoto",
            )
        except ImportError:
            from ..ops.scan import scores_np

            rows = virtual_rows_np(
                indices, word_count=self.shape[1], seed=self.seed
            )
            return scores_np(rows, np.asarray(query_full)[None, :],
                             similarity, alpha, beta)[0]


class VirtualFingerprints:
    """Lazy ``uint8 (count, bitcount // 8)`` face of a virtual library —
    what a synthetic-kind ``.tfsim`` exposes as ``FingerprintData.
    fingerprints`` (``utils/tfsim.py`` format v3). Carries the same
    ``shape``/``nbytes`` surface the loaders and the registry's fold
    arithmetic read; bulk access goes through :attr:`words`."""

    __slots__ = ("words",)
    dtype = np.dtype(np.uint8)

    def __init__(self, count: int, bitcount: int = 1024, seed: int = 0):
        if bitcount % 32:
            raise ValueError(f"bitcount {bitcount} not divisible by 32")
        self.words = VirtualWords(count, bitcount // 32, seed)

    @property
    def shape(self) -> tuple:
        n, w = self.words.shape
        return (n, w * 4)

    @property
    def seed(self) -> int:
        return self.words.seed

    @property
    def nbytes(self) -> int:
        return self.words.nbytes

    def __len__(self) -> int:
        return self.words.shape[0]

    def __getitem__(self, key):
        rows = self.words[key]
        return np.ascontiguousarray(rows).view(np.uint8)


def build_virtual_dense_store(
    n_rows: int,
    fold_factor: int,
    mesh=None,
    axis: str | None = None,
    word_count: int = 32,
    seed: int = 0,
    popless: bool = True,
    chunk_cols: int | None = None,
    row_chunk: int = 1 << 17,
):
    """Generate the folded virtual library directly in HBM as a DENSE store.

    The dense counterpart of :func:`build_virtual_bitplane_store`: one SPMD
    pass generates each shard's global row range chunk-by-chunk from the
    counter mixer, OR-folds, transposes to the planar ``(wf, cols)`` layout,
    and accumulates into the store buffer in place (``fori_loop`` carry) —
    peak transient HBM is O(row_chunk). ``popless=True`` (the default here)
    skips the int16 popcount array: at 1.024B rows fold-8 the planes alone
    are 15.26 GiB of a 15.75 GiB chip and the scan recomputes column pops
    on the fly (:func:`~..parallel.sharded._score_columns`).

    Padding columns beyond ``n_rows`` hold real mixer rows — the scan's
    ``n_valid`` mask (not zero data) is what excludes them, exactly as for
    uploaded stores.
    """
    import jax
    import jax.numpy as jnp

    from ..parallel.mesh import SHARD_AXIS, make_mesh
    from ..parallel.sharded import (
        DEFAULT_CHUNK_COLS,
        ShardedStore,
        plan_store_layout,
    )

    try:
        from jax import shard_map as _shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _shard_map
    from jax.sharding import PartitionSpec as P

    axis = axis or SHARD_AXIS
    if mesh is None:
        mesh = make_mesh(axis=axis)
    n_shards = mesh.shape[axis]
    if word_count % fold_factor:
        raise ValueError("fold factor must divide the word count")
    wf = word_count // fold_factor
    per_shard, chunk, n_padded = plan_store_layout(
        n_rows, n_shards, chunk_cols or DEFAULT_CHUNK_COLS
    )
    gen_chunk = min(row_chunk, per_shard)
    while per_shard % gen_chunk:
        gen_chunk //= 2
    gen_chunk = max(128, gen_chunk)
    n_chunks = per_shard // gen_chunk

    def gen_shard(planes0, *rest):
        s = jax.lax.axis_index(axis).astype(jnp.uint32)
        row_base = s * jnp.uint32(per_shard)
        pops0 = rest[0] if rest else None

        def body(ci, carry):
            planes, pops = carry
            loc0 = ci * gen_chunk
            full = _virtual_rows_jnp(
                row_base + loc0.astype(jnp.uint32), gen_chunk, word_count,
                seed,
            )  # (gen_chunk, W)
            folded = jnp.bitwise_or.reduce(
                full.reshape(gen_chunk, fold_factor, wf), axis=1
            )
            planes = jax.lax.dynamic_update_slice(planes, folded.T, (0, loc0))
            if pops is not None:
                rp = jnp.sum(
                    jax.lax.population_count(folded).astype(jnp.int32), axis=1
                ).astype(jnp.int16)
                pops = jax.lax.dynamic_update_slice(pops, rp, (loc0,))
            return planes, pops

        planes, pops = jax.lax.fori_loop(
            0, n_chunks, body, (planes0, pops0)
        )
        return (planes,) if popless else (planes, pops)

    words_sharding = jax.NamedSharding(mesh, P(None, axis))
    pops_sharding = jax.NamedSharding(mesh, P(axis))
    in_specs = (P(None, axis),) if popless else (P(None, axis), P(axis))
    out_specs = in_specs
    mapped = _shard_map(
        gen_shard, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    # the store buffer enters as a DONATED jit argument: at 1.024B rows
    # fold-8 the planes are 15.26 of 15.75 GiB — an unaliased fill output
    # would OOM, so in-place is guaranteed rather than hoped for
    args = [
        jax.jit(
            lambda: jnp.zeros((wf, per_shard * n_shards), jnp.uint32),
            out_shardings=words_sharding,
        )()
    ]
    if not popless:
        args.append(
            jax.jit(
                lambda: jnp.zeros((per_shard * n_shards,), jnp.int16),
                out_shardings=pops_sharding,
            )()
        )
    out = jax.jit(
        mapped,
        donate_argnums=tuple(range(len(args))),
        out_shardings=(
            (words_sharding,) if popless else (words_sharding, pops_sharding)
        ),
    )(*args)
    planes = out[0]
    pops = None if popless else out[1]
    # fetch-sync: the store must actually be resident before first search
    jax.device_get(planes[:1, :1])
    return ShardedStore(
        mesh=mesh,
        axis=axis,
        words=planes,
        popcounts=pops,
        n_valid=n_rows,
        chunk_cols=chunk,
    )


def virtual_full_topk(
    n_rows: int,
    queries_full: np.ndarray,
    k: int,
    seed: int = 0,
    word_count: int = 32,
    row_chunk: int = 1 << 16,
    cutoffs=(),
):
    """EXACT full-width top-k over a virtual library, computed on device.

    The oracle for folded-search recall at scales where no stored full-width
    matrix can exist (1.024B rows x 128 B = 122 GB > this host's disk): rows
    are generated in-register from the mixer chunk by chunk, scored at full
    width, and only a running ``(B, k)`` top-k survives — near-zero HBM, so
    it can run before a flagship server boots on the same chip. Returns
    ``(scores f32 (B, k), indices i64 (B, k), counts i64 (B, len(cutoffs)))``
    where counts are exact full-width >=cutoff tallies. Tie-break is lowest
    index, like the engine (carry-first concat + top_k's first-occurrence
    order make that hold across chunks).

    This is an ORACLE, not the search engine: it only works because the
    library is a formula. Real libraries are data; the engine's store scan
    + fold rescore is the production path being judged against this.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from ..ops.scan import exact_div, popcount_rows_np

    q = np.ascontiguousarray(queries_full, dtype=np.uint32)
    if q.ndim == 1:
        q = q[None, :]
    b, w = q.shape
    if w != word_count:
        raise ValueError(f"queries have {w} words, library has {word_count}")
    chunk = min(row_chunk, max(128, n_rows))
    n_chunks = -(-n_rows // chunk)
    cut = np.asarray(cutoffs, np.float32)

    @functools.partial(jax.jit, static_argnames=())
    def run(qd, qpops, cutd):
        def body(ci, carry):
            vals, idx, counts = carry
            row0 = (ci * chunk).astype(jnp.uint32)
            rows = _virtual_rows_jnp(row0, chunk, word_count, seed)
            inter = jnp.bitwise_and(rows[None, :, :], qd[:, None, :])
            common = jnp.sum(
                jax.lax.population_count(inter).astype(jnp.int32), axis=-1
            )  # (B, chunk)
            dpops = jnp.sum(
                jax.lax.population_count(rows).astype(jnp.int32), axis=-1
            )  # (chunk,)
            c = common.astype(jnp.float32)
            denom = qpops[:, None] + dpops[None, :].astype(jnp.float32) - c
            # correctly-rounded divide so this oracle's scores/counts are
            # bit-identical to the numpy oracle (see scan.exact_div)
            s = jnp.where(denom > 0, exact_div(c, jnp.maximum(denom, 1.0)), 0.0)
            s = jnp.where((c == denom) & (denom > 0), 1.0, s)
            gidx = ci * chunk + jax.lax.broadcasted_iota(
                jnp.int32, (1, chunk), 1
            )
            s = jnp.where(gidx < n_rows, s, -jnp.inf)
            counts = counts + jnp.sum(
                (s[:, None, :] >= cutd[None, :, None]).astype(jnp.int32),
                axis=-1,
            )
            cat_v = jnp.concatenate([vals, s], axis=1)
            cat_i = jnp.concatenate(
                [idx, jnp.broadcast_to(gidx, (b, chunk))], axis=1
            )
            v2, pos = jax.lax.top_k(cat_v, k)
            i2 = jnp.take_along_axis(cat_i, pos.astype(jnp.int32), axis=1)
            return v2, i2, counts

        vals0 = jnp.full((b, k), -jnp.inf, jnp.float32)
        idx0 = jnp.full((b, k), -1, jnp.int32)
        counts0 = jnp.zeros((b, len(cutoffs)), jnp.int32)
        return jax.lax.fori_loop(0, n_chunks, body, (vals0, idx0, counts0))

    vals, idx, counts = jax.device_get(
        run(
            jnp.asarray(q),
            jnp.asarray(popcount_rows_np(q).astype(np.float32)),
            jnp.asarray(cut if cut.size else np.zeros(1, np.float32))[
                : len(cutoffs)
            ],
        )
    )
    return vals, idx.astype(np.int64), counts.astype(np.int64)


def virtual_matrix(
    n_rows: int, word_count: int = 32, seed: int = 0
) -> np.ndarray:
    """Full-width matrix of the first ``n_rows`` virtual rows, in host RAM.

    Uses the native fill when available (~GB/s; the 45 GB fold-bench matrix
    takes ~a minute) and falls back to slab-wise numpy mixing.
    """
    try:
        from . import native

        return native.synth_fill(n_rows, word_count=word_count, seed=seed)
    except ImportError:
        out = np.empty((n_rows, word_count), np.uint32)
        slab = 1 << 20
        for lo in range(0, n_rows, slab):
            hi = min(lo + slab, n_rows)
            out[lo:hi] = virtual_rows_np(
                np.arange(lo, hi), word_count=word_count, seed=seed
            )
        return out


def pick_query_rows(
    count: int,
    n_rows: int,
    fold_factor: int,
    word_count: int = 32,
    seed: int = 0,
    max_planes: int = 64,
    rng_seed: int = 123,
) -> np.ndarray:
    """Library rows usable as benchmark queries: folded popcount <= bucket.

    The Pallas kernel's plane bucket caps a query's set-plane count; a
    typical virtual row folds to ~37 planes at fold 4 but the upper tail
    can cross 64, which would bump the whole batch into the next (2x DMA)
    bucket. Rejection-sample rows until ``count`` of them fit — mirroring
    real Morgan traffic, where >64-plane folded queries are rare and would
    be served by a separately warmed bucket.
    """
    from ..ops import fold as fold_ops
    from ..ops.scan import popcount_rows_np

    rng = np.random.default_rng(rng_seed)
    picked: list[int] = []
    while len(picked) < count:
        cand = rng.choice(n_rows, size=4 * count, replace=False)
        rows = virtual_rows_np(cand, word_count=word_count, seed=seed)
        fp = popcount_rows_np(fold_ops.fold_words(rows, fold_factor))
        picked.extend(int(c) for c, p in zip(cand, fp) if p <= max_planes)
    return np.array(picked[:count], dtype=np.int64)


def rescore_candidates_np(
    indices: np.ndarray,
    query_full: np.ndarray,
    k: int,
    n_rows: int,
    seed: int = 0,
    similarity: str = "tanimoto",
    alpha: float = 1.0,
    beta: float = 1.0,
):
    """Exact full-width re-score of folded-scan candidates (host side).

    Mirrors ``FingerprintDB._assemble``'s fold path (reference
    ``fingerprintdb_cuda.cu:307-331``): recompute the candidates'
    full-width rows from the virtual mixer (natively when built — this is
    on the benchmark's timed path), score against the full-width query,
    and re-sort with the engine's lowest-index tie-break. Returns
    ``(scores, indices)`` trimmed to ``k``.
    """
    indices = np.asarray(indices)
    keep = (indices >= 0) & (indices < n_rows)
    indices = np.sort(indices[keep].astype(np.int64))
    try:
        from . import native

        scores = native.synth_rescore(
            indices, np.asarray(query_full, np.uint32), seed=seed,
            alpha=alpha, beta=beta, tversky=similarity != "tanimoto",
        )
    except ImportError:
        from ..ops.scan import scores_np

        rows = virtual_rows_np(indices, word_count=len(query_full), seed=seed)
        scores = scores_np(
            rows, query_full[None, :], similarity, alpha, beta
        )[0]
    order = np.lexsort((indices, -scores))[:k]
    return scores[order], indices[order]

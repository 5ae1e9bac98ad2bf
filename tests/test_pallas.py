"""Pallas phase-1 kernel: exact equality with the XLA reference path.

Runs in interpreter mode on CPU (the reference's SKIP_CUDA analog); the same
kernel compiles natively on TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpusimilarity_tpu.ops.pallas_scan import pallas_phase1
from gpusimilarity_tpu.ops.scan import popcount_rows_np, scores_np


def make_db(rng, n, density=0.1):
    bits = rng.random((n, 1024)) < density
    packed = np.packbits(bits, axis=1, bitorder="little")
    return packed.view(np.uint32)


def xla_reference(db_planar, pops, queries, qpops, cutoffs, n_valid, block, offset=0):
    """Independent computation of block maxima + counts."""
    words = np.ascontiguousarray(db_planar.T)  # (N, W)
    scores = scores_np(words, queries)  # (B, N)
    n = scores.shape[-1]
    idx = offset + np.arange(n)
    scores = np.where(idx < n_valid, scores, -np.inf)
    bmax = scores.reshape(scores.shape[0], -1, block).max(axis=-1)
    cnts = (scores >= cutoffs[:, None]).sum(axis=-1).astype(np.int32)
    return bmax.astype(np.float32), cnts


class TestPallasPhase1:
    @pytest.mark.parametrize("b", [1, 4])
    def test_matches_reference(self, rng, b):
        n, chunk, block = 4096, 4096, 32
        words = make_db(rng, n)
        planar = np.ascontiguousarray(words.T)
        pops = popcount_rows_np(words)
        queries = words[:b]
        qpops = pops[:b].copy()
        cutoffs = np.linspace(0.0, 0.3, b, dtype=np.float32)

        bmax, cnt = pallas_phase1(
            jnp.asarray(planar),
            jnp.asarray(pops),
            jnp.asarray(queries),
            jnp.asarray(qpops),
            jnp.asarray(cutoffs),
            jnp.float32(1.0),
            jnp.float32(1.0),
            jnp.int32(0),
            chunk=chunk,
            block=block,
            n_valid=n,
            interpret=True,
        )
        ref_bmax, ref_cnt = xla_reference(
            planar, pops, queries, qpops, cutoffs, n, block
        )
        np.testing.assert_allclose(np.asarray(bmax), ref_bmax, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(cnt), ref_cnt)

    def test_padding_masked(self, rng):
        n_valid, n_pad = 700, 1024
        words = np.zeros((n_pad, 32), np.uint32)
        words[:n_valid] = make_db(rng, n_valid)
        planar = np.ascontiguousarray(words.T)
        pops = popcount_rows_np(words)
        q = words[:1]
        bmax, cnt = pallas_phase1(
            jnp.asarray(planar), jnp.asarray(pops), jnp.asarray(q),
            jnp.asarray(pops[:1]), jnp.asarray(np.zeros(1, np.float32)),
            jnp.float32(1.0), jnp.float32(1.0), jnp.int32(0),
            chunk=512, block=4, n_valid=n_valid, interpret=True,
        )
        # padded tail blocks are all -inf
        assert np.asarray(bmax)[0, -2:].max() == -np.inf
        assert int(cnt[0]) == n_valid  # cutoff 0 counts every valid column

    def test_shard_offset_shifts_validity(self, rng):
        words = make_db(rng, 512)
        planar = np.ascontiguousarray(words.T)
        pops = popcount_rows_np(words)
        q = words[:1]
        # offset 400 with n_valid 600: only first 200 columns valid
        bmax, cnt = pallas_phase1(
            jnp.asarray(planar), jnp.asarray(pops), jnp.asarray(q),
            jnp.asarray(pops[:1]), jnp.asarray(np.zeros(1, np.float32)),
            jnp.float32(1.0), jnp.float32(1.0), jnp.int32(400),
            chunk=512, block=4, n_valid=600, interpret=True,
        )
        assert int(cnt[0]) == 200
        assert np.asarray(bmax)[0, 50:].max() == -np.inf  # cols >=200 invalid, block=4

    def test_bitplane_kernel_mc8_scaling(self, rng):
        """Dense query (plane bucket 256) runs the bitplane kernel at the
        VMEM-scaled chunk width mc8=512 and still matches the oracle."""
        from gpusimilarity_tpu.ops.bitplane import (
            build_bitplanes_np, query_plane_indices,
        )
        from gpusimilarity_tpu.ops.pallas_bitplane import (
            build_pops3, pallas_bitplane_phase1,
        )
        from gpusimilarity_tpu.parallel.sharded import _bitplane_kernel_mc8

        m8s, n = 512, 131072  # single-shard layout, exactly full
        words = make_db(rng, n, density=0.08)
        planes = build_bitplanes_np(
            np.ascontiguousarray(words).view(np.uint8), n
        )
        planes = np.concatenate(
            [planes, np.zeros((1, planes.shape[1]), np.uint32)]
        )
        # single-shard sub-row interleave (build_bitplane_store, n_shards=1)
        arranged = (
            planes.reshape(1025, 8, m8s).reshape(1025 * 8, m8s)
        )
        pops = popcount_rows_np(words).astype(np.int32)
        pops3 = np.asarray(build_pops3(pops, 1))

        bits = np.zeros((1, 1024), np.uint8)
        bits[0, rng.choice(1024, 200, replace=False)] = 1
        q = np.packbits(bits, axis=1, bitorder="little").view(np.uint32)
        plane_idx, bucket = query_plane_indices(q, 1024)
        assert bucket == 256
        mc8 = _bitplane_kernel_mc8(bucket)
        assert mc8 == 512
        qpop = int(popcount_rows_np(q)[0])

        block_max, cnt = pallas_bitplane_phase1(
            jnp.asarray(arranged), jnp.asarray(pops3),
            jnp.asarray(plane_idx[0]), jnp.int32(qpop), jnp.float32(0.05),
            jnp.asarray(np.ones(2, np.float32)), jnp.int32(0),
            mc8=mc8, bw8=8, n_valid=n, interpret=True,
        )
        s = scores_np(words, q)[0]
        # block j = max over sub-rows r, words u in [8j, 8j+8), bits b
        ref_bmax = s.reshape(8, m8s // 8, 8, 32).max(axis=(0, 2, 3))
        np.testing.assert_allclose(np.asarray(block_max), ref_bmax, rtol=1e-6)
        assert int(cnt) == int((s >= 0.05).sum())

    def test_bitplane_batched_matches_single(self, rng):
        """The (n_chunks, B) batched grid returns per-query results equal to
        B independent single-query launches — including a zero-padded
        (empty) query, which must score 0 everywhere without NaNs."""
        from gpusimilarity_tpu.ops.bitplane import (
            build_bitplanes_np, query_plane_indices,
        )
        from gpusimilarity_tpu.ops.pallas_bitplane import (
            build_pops3, pallas_bitplane_phase1, pallas_bitplane_phase1_batched,
        )

        m8s, n = 256, 65536
        words = make_db(rng, n)
        planes = build_bitplanes_np(
            np.ascontiguousarray(words).view(np.uint8), n
        )
        planes = np.concatenate(
            [planes, np.zeros((1, planes.shape[1]), np.uint32)]
        )
        arranged = planes.reshape(1025, 8, m8s).reshape(1025 * 8, m8s)
        pops = popcount_rows_np(words).astype(np.int32)
        pops3 = np.asarray(build_pops3(pops, 1))

        queries = np.concatenate(
            [words[[7, 999]], np.zeros((1, 32), np.uint32)]
        )
        plane_idx, bucket = query_plane_indices(queries, 1024)
        qpops = popcount_rows_np(queries).astype(np.int32)
        cutoffs = np.array([0.0, 0.2, 0.5], np.float32)
        ab = jnp.asarray(np.ones(2, np.float32))

        bmax, cnt, colmax = pallas_bitplane_phase1_batched(
            jnp.asarray(arranged), jnp.asarray(pops3),
            jnp.asarray(plane_idx), jnp.asarray(qpops),
            jnp.asarray(cutoffs), ab, jnp.int32(0),
            mc8=128, bw8=8, n_valid=n, interpret=True,
        )
        assert colmax.shape == (3, 8, m8s)
        assert not np.isnan(np.asarray(bmax)).any()
        for qi in range(3):
            b1, c1 = pallas_bitplane_phase1(
                jnp.asarray(arranged), jnp.asarray(pops3),
                jnp.asarray(plane_idx[qi]), jnp.int32(int(qpops[qi])),
                jnp.float32(float(cutoffs[qi])), ab, jnp.int32(0),
                mc8=128, bw8=8, n_valid=n, interpret=True,
            )
            np.testing.assert_array_equal(np.asarray(bmax[qi]), np.asarray(b1))
            assert int(cnt[qi]) == int(c1)
        # oracle cross-check for the first query
        s = scores_np(words, queries[:1])[0]
        ref = s.reshape(8, m8s // 8, 8, 32).max(axis=(0, 2, 3))
        np.testing.assert_allclose(np.asarray(bmax[0]), ref, rtol=1e-6)
        assert int(cnt[0]) == n  # cutoff 0 counts every valid column
        # empty query: all scores exactly 0
        assert float(np.asarray(bmax[2]).max()) == 0.0

    def test_rational_branch_bit_identical(self, rng):
        """cutoff <= 0 takes the integer cross-multiplied max branch; its
        colmax must be BIT-identical to the per-column-division branch
        (forced with an epsilon cutoff — counts differ only in that every
        valid column counts at cutoff 0), and counts at cutoff 0 must equal
        the valid-column total the branch computes from vlim alone."""
        from gpusimilarity_tpu.ops.bitplane import query_plane_indices
        from gpusimilarity_tpu.ops.pallas_bitplane import (
            build_pops3, pallas_bitplane_phase1_batched,
        )
        from gpusimilarity_tpu.ops.bitplane import build_bitplanes_np

        m8s, n_pad, n_valid = 256, 65536, 60000
        words = np.zeros((n_pad, 32), np.uint32)
        words[:n_valid] = make_db(rng, n_valid, density=0.06)
        planes = build_bitplanes_np(
            np.ascontiguousarray(words).view(np.uint8), n_pad
        )
        planes = np.concatenate(
            [planes, np.zeros((1, planes.shape[1]), np.uint32)]
        )
        arranged = planes.reshape(1025, 8, m8s).reshape(1025 * 8, m8s)
        pops = popcount_rows_np(words).astype(np.int32)
        pops3 = np.asarray(build_pops3(pops, 1))
        queries = words[[3, 11]]
        plane_idx, _bucket = query_plane_indices(queries, 1024)
        qpops = popcount_rows_np(queries).astype(np.int32)
        ab = jnp.asarray(np.ones(2, np.float32))

        def run(cut):
            return pallas_bitplane_phase1_batched(
                jnp.asarray(arranged), jnp.asarray(pops3),
                jnp.asarray(plane_idx), jnp.asarray(qpops),
                jnp.asarray(np.full(2, cut, np.float32)), ab, jnp.int32(0),
                mc8=128, bw8=8, n_valid=n_valid, interpret=True,
            )

        bm0, cnt0, cm0 = run(0.0)  # rational branch
        bm1, _cnt1, cm1 = run(1e-30)  # division branch (cutoff > 0)
        np.testing.assert_array_equal(np.asarray(cm0), np.asarray(cm1))
        np.testing.assert_array_equal(np.asarray(bm0), np.asarray(bm1))
        np.testing.assert_array_equal(np.asarray(cnt0), [n_valid, n_valid])

    def test_tversky_mode(self, rng):
        n = 1024
        words = make_db(rng, n)
        planar = np.ascontiguousarray(words.T)
        pops = popcount_rows_np(words)
        q = words[:2]
        bmax, cnt = pallas_phase1(
            jnp.asarray(planar), jnp.asarray(pops), jnp.asarray(q),
            jnp.asarray(pops[:2]), jnp.asarray(np.zeros(2, np.float32)),
            jnp.float32(0.3), jnp.float32(0.7), jnp.int32(0),
            chunk=512, block=4, n_valid=n, similarity="tversky",
            interpret=True,
        )
        ref = scores_np(words, q, similarity="tversky", alpha=0.3, beta=0.7)
        ref_bmax = ref.reshape(2, -1, 4).max(axis=-1)
        np.testing.assert_allclose(np.asarray(bmax), ref_bmax, rtol=1e-6)

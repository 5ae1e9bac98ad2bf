"""Fingerprint folding: lossy width reduction with exact-rescore recovery.

The reference folds fingerprints when the library exceeds device memory
(``calculation_functors.cpp:22-41``): bit ``p`` ORs into ``p % folded_size``.
Because the engine works on packed 32-bit words and the fold factor is rounded
up until it divides the word count (``fingerprintdb_cuda.cu:171-173``), the
bit-level fold is exactly a word-level OR-reduce::

    folded[w] = OR_{g < fold} unfolded[g * (W // fold) + w]

After scanning the folded library, the top ``k * fold * log2(2*fold)``
candidates (over-fetch rule at ``fingerprintdb_cuda.cu:284-287``, validated in
the reference presentation slides 10-12) are re-scored with full-width
fingerprints and re-sorted, making the final top-k near-exact (0% mismatch at
fold 2, 0.1% at fold 4, 1.45% at fold 8 per slide 11).
"""

from __future__ import annotations

import math

import numpy as np


def round_fold_factor(word_count: int, fold_factor: int) -> int:
    """Round ``fold_factor`` up to the next divisor of ``word_count``.

    Mirrors ``fingerprintdb_cuda.cu:171-173`` (``while(total_data_size %
    fold_factor != 0) fold_factor++``) but in words rather than bytes.
    """
    if fold_factor < 1:
        raise ValueError("fold factor must be >= 1")
    while word_count % fold_factor != 0:
        fold_factor += 1
    return fold_factor


def fold_words(words, fold_factor: int):
    """OR-fold packed fingerprints along the word axis by ``fold_factor``.

    Works on numpy or jax arrays of shape ``(..., W)``; ``fold_factor`` must
    divide ``W``. Identity when ``fold_factor == 1``.
    """
    if fold_factor == 1:
        return words
    w = words.shape[-1]
    if w % fold_factor != 0:
        raise ValueError(f"fold factor {fold_factor} does not divide {w} words")
    if isinstance(words, np.ndarray) and words.ndim == 2 and len(words) >= 1024:
        try:
            from ..utils import native

            return native.fold_rows(words, fold_factor)
        except ImportError:
            pass
    grouped = words.reshape(*words.shape[:-1], fold_factor, w // fold_factor)
    if isinstance(grouped, np.ndarray):
        return np.bitwise_or.reduce(grouped, axis=-2)
    import jax.numpy as jnp

    return jnp.bitwise_or.reduce(grouped, axis=-2)


def fold_bits(bits: np.ndarray, fold_factor: int) -> np.ndarray:
    """Bit-level OR-fold of an unpacked 0/1 array (test oracle).

    Matches the reference's per-bit definition (``calculation_functors.cpp:
    28-40``): output bit ``p`` = OR of input bits ``{p, p+S, p+2S, ...}`` where
    ``S = len // fold``.
    """
    n = bits.shape[-1]
    if n % fold_factor != 0:
        raise ValueError("fold factor must divide the bit length")
    return (
        bits.reshape(*bits.shape[:-1], fold_factor, n // fold_factor)
        .any(axis=-2)
        .astype(bits.dtype)
    )


def overfetch_count(k: int, fold_factor: int) -> int:
    """Candidate count to pull from a folded scan before exact re-scoring.

    The reference's empirically validated rule ``k * fold * log2(2 * fold)``
    (``fingerprintdb_cuda.cu:284-287``); equals ``k`` at fold 1.
    """
    if fold_factor == 1:
        return k
    return int(math.ceil(k * fold_factor * math.log2(2 * fold_factor)))

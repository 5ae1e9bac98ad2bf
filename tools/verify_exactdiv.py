"""On-chip verification of exact_div and the cutoff-count predicate.

Round-5 diagnosis: v5e f32 division (reciprocal-multiply) misrounds ~34% of
small-integer quotients 1 ulp low, flipping ``score >= cutoff`` at boundary
fractions and diverging returned fold=1 scores from the numpy oracle
(BENCH ``oracle_count_mismatches: 11``). ``ops.scan.exact_div`` repairs it;
this tool proves the repair ON THE REAL CHIP:

1. raw-divide misround census over every (num <= 2048, 1 <= den <= 4096)
   pair — documents the hardware defect;
2. exact_div over the same grid — must be 0 mismatches vs numpy;
3. the engine predicate ``similarity_from_counts(...) >= cutoff`` over all
   valid Tanimoto triples at the golden cutoffs — must match numpy.

Usage:  python tools/verify_exactdiv.py        (runs on the default backend)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
import jax.numpy as jnp

from gpusimilarity_tpu.ops.scan import exact_div


def grid(max_num=2048, max_den=4096):
    num = np.arange(0, max_num + 1, dtype=np.float32)
    den = np.arange(1, max_den + 1, dtype=np.float32)
    c = np.repeat(num, len(den))
    d = np.tile(den, len(num))
    return c, d


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    c, d = grid()
    want = c / d  # numpy: IEEE correctly rounded

    t0 = time.time()
    raw = np.asarray(jax.jit(lambda a, b: a / b)(jnp.asarray(c), jnp.asarray(d)))
    n_raw_bad = int((raw != want).sum())
    print(
        f"raw divide: {n_raw_bad}/{len(c)} misrounded "
        f"({100.0 * n_raw_bad / len(c):.1f}%)  [{time.time()-t0:.1f}s]",
        flush=True,
    )

    t0 = time.time()
    got = np.asarray(jax.jit(exact_div)(jnp.asarray(c), jnp.asarray(d)))
    bad = got != want
    print(
        f"exact_div:  {int(bad.sum())}/{len(c)} mismatches  "
        f"[{time.time()-t0:.1f}s]",
        flush=True,
    )
    if bad.any():
        i = np.nonzero(bad)[0][:5]
        for j in i:
            print(f"  {c[j]}/{d[j]}: got {got[j]!r} want {want[j]!r}")
        sys.exit(1)

    # the cutoff predicate over every (common, den) with den >= common —
    # exactly the quotient set a Tanimoto score can ever be (score <= 1)
    sel = d >= c
    cc, dd = c[sel], d[sel]
    fails = 0
    for cut in (0.2, 0.3, 0.4, 0.5, 1.0):
        cutf = np.float32(cut)
        np_ge = (cc / dd) >= cutf
        dev_ge = np.asarray(
            jax.jit(lambda a, b: exact_div(a, b) >= cutf)(
                jnp.asarray(cc), jnp.asarray(dd)
            )
        )
        n = int((np_ge != dev_ge).sum())
        fails += n
        print(f"cutoff {cut}: {n} predicate disagreements", flush=True)
    print("RESULT:", "PASS" if fails == 0 else "FAIL", flush=True)
    sys.exit(0 if fails == 0 else 1)


if __name__ == "__main__":
    main()

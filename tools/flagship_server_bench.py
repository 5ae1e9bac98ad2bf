"""Flagship scale number, measured through the REAL serving stack.

The reference's headline configs are 510M rows fold-8 on 2x1080Ti
(481.8 ms avg) and 1.02B rows fold-4 on 4xV100 (451.7 ms avg)
(presentation slides 12-13; README.md:13). This tool runs the closest
executable analog on ONE v5e chip: a 768M-row / 91.5 GiB ``.tfsim``
library (5.8x the chip's usable HBM), fold-8 dense scan with the
k*fold*log2(2*fold) over-fetch and exact full-width re-score from the
memory map — served end-to-end by ``cli/server.py`` and queried over
HTTP (not a bare engine loop).

Per query it checks: rank-0 is the query row's own id at score 1.0
(the folded over-fetch recovered the exact self-match), every returned
score equals the full-width numpy oracle score of that row (the rescore
path is exact, not the folded approximation), and scores are descending.

Usage: python tools/flagship_server_bench.py [--lib DIR] [--queries N]
       [--k 128] [--fold 8] [--port P]
Prints ONE JSON summary line. Generate the library first with
``tools/fold_scale.py --rows 768000000 --and_slabs 4 --generate_only``.
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
import urllib.error
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GiB = 1 << 30


def post(port, body, timeout=600):
    req = urllib.request.Request(
        f"http://localhost:{port}/similarity_search_json", data=body.encode()
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lib", default="/tmp/tpusim_fold_scale/rows768000000_d4.tfsim")
    ap.add_argument("--queries", type=int, default=12)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--fold", type=int, default=8)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    port = args.port or (20000 + os.getpid() % 10000)  # FRESH port: the
    # tunnel keeper squats on every previously bound loopback port

    import numpy as np

    from gpusimilarity_tpu.ops.scan import scores_np
    from gpusimilarity_tpu.utils.tfsim import load_native

    data = load_native(args.lib)
    full = data.packed_words()  # zero-copy view of the mmap
    n = data.count
    lib_gib = data.fingerprints.nbytes / GiB

    # Overlapped startup (round 4): warmup shapes AOT-precompile on a
    # background thread WHILE the 91.5 GiB library streams/folds/uploads,
    # and the mmap page prewarm runs behind the ready line. One warmup k
    # (the benched k=128) — each extra k-fetch bucket is its own
    # multi-minute remote compile.
    server_cmd = [
        sys.executable, "-m", "gpusimilarity_tpu.cli.server", args.lib,
        "--port", str(port), "--fold", str(args.fold),
        "--warmup_ks", str(args.k), "--warmup_batch", "1",
        "--jax_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache_tpu"),
    ]
    if args.cpu:
        server_cmd.append("--cpu_only")
    log_path = Path(f"/tmp/flagship_server_{port}.log")
    t_start = time.monotonic()
    proc = subprocess.Popen(
        server_cmd, stdout=log_path.open("wb"), stderr=subprocess.STDOUT
    )
    dbname = Path(args.lib).name
    for suffix in (".tfsim", ".fsim"):
        if dbname.endswith(suffix):
            dbname = dbname[: -len(suffix)]
    try:
        # wait for load + upload (fold-8 streams the whole 91.5 GiB map once)
        while True:
            if proc.poll() is not None:
                sys.exit(f"server died; see {log_path}")
            if "ready on" in log_path.read_text(errors="replace"):
                break
            time.sleep(5)
        load_s = time.monotonic() - t_start

        rng = np.random.default_rng(123)
        q_rows = rng.choice(n, size=args.queries, replace=False)

        def query(qi, timeout=3600):  # a cold fold-8 768M program can
            # compile for >30 min on the remote compiler; killing the
            # server mid-compile also loses the persistent-cache entry
            body = (
                f"fp_hex={np.array(full[qi]).tobytes().hex()}"
                f"&return_count={args.k}&similarity_cutoff=0"
                f"&dbnames={dbname}&dbkeys={data.dbkey}"
            )
            deadline = time.monotonic() + timeout
            while True:
                try:
                    return post(port, body)
                except urllib.error.HTTPError as e:
                    if e.code == 503 and time.monotonic() < deadline:
                        time.sleep(5)  # first query of a shape compiles
                        continue
                    raise

        t0 = time.monotonic()
        query(int(q_rows[0]))
        compile_s = time.monotonic() - t0

        # the rescore-page prewarm keeps streaming the 91.5 GiB map behind
        # the ready line; wait for it so the timed passes measure steady-
        # state serving, not disk contention with the warmer
        prewarm_deadline = time.monotonic() + 3600
        while time.monotonic() < prewarm_deadline:
            text = log_path.read_text(errors="replace")
            if "prewarmed" in text or "prewarm skipped" in text \
                    or "prewarm not needed" in text:
                break
            time.sleep(5)
        prewarm_s = time.monotonic() - t_start

        lat, warm_lat, exact_ok = [], [], 0
        for qi in q_rows:
            qi = int(qi)
            t0 = time.monotonic()
            r = query(qi)
            lat.append(time.monotonic() - t0)
            ids = [row[0] for row in r["results"]]
            scores = [row[2] for row in r["results"]]
            rows = np.array([int(i[3:]) for i in ids])  # SYN%010d
            oracle = scores_np(
                np.array(full[rows]), np.array(full[qi])[None, :]
            )[0]
            if (
                rows[0] == qi
                and scores[0] == 1.0
                and np.allclose(scores, oracle, atol=1e-6)
                and scores == sorted(scores, reverse=True)
            ):
                exact_ok += 1
        # second pass over the same rows: fully-warm serving latency (any
        # page the first pass faulted is now resident)
        for qi in q_rows:
            t0 = time.monotonic()
            query(int(qi))
            warm_lat.append(time.monotonic() - t0)
        p50 = statistics.median(lat)
        print(
            json.dumps(
                {
                    "metric": "flagship_server_path_p50_ms",
                    "value": round(p50 * 1e3, 1),
                    "unit": "ms",
                    "rows": n,
                    "fold": args.fold,
                    "k": args.k,
                    "library_gib": round(lib_gib, 1),
                    "device_gib": round(lib_gib / args.fold, 1),
                    "exactness_checks_passed": f"{exact_ok}/{args.queries}",
                    "fps_per_chip": round(n / p50, 1),
                    "min_ms": round(min(lat) * 1e3, 1),
                    "warm_p50_ms": round(statistics.median(warm_lat) * 1e3, 1),
                    "server_load_s": round(load_s, 1),
                    "compile_plus_first_s": round(compile_s, 1),
                    # time from exec to the first query answered — the
                    # honest cold-start number (compiles/upload/prewarm
                    # overlap, so the two components above no longer add)
                    "cold_start_s": round(load_s + compile_s, 1),
                    "prewarm_done_s": round(prewarm_s, 1),
                    "path": "cli.server + HTTP",
                }
            )
        )
        if exact_ok != args.queries:
            sys.exit("exactness check failed")
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()

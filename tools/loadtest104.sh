#!/bin/bash
# Serving throughput at the current bench-default scale: 104M-row bitplane
# library (13.3 GB packed, Morgan-like 6.25% density), batching at
# --max_batch 64 — the round-3 review asked for a current qps number (the
# old 150-170 qps figure predates the 104M default, k-bucket promotion and
# the paired-bit kernel). 32 clients x 8 passes after a sequential bucket
# ramp (cold shapes compile on the request thread; the ramp pays each
# batch-bucket compile once). Prints LOAD cold/warm lines + a JSON record.
#
# Env knobs: LOADTEST_ROWS (default 104000000), LOADTEST_PORT (pick a FRESH
# port every run — the axon tunnel keeper squats on old ones), LOADTEST_DIR.
set -e
cd /root/repo
ROWS=${LOADTEST_ROWS:-104000000}
D=${LOADTEST_DIR:-/tmp/tpusim_load104}
# default: a FRESH kernel-assigned free port — a fixed default re-hit the
# tunnel keeper's squatted-port EADDRINUSE on every second run (r4 advisor)
PORT=${LOADTEST_PORT:-$(python -c 'import socket; s=socket.socket(); s.bind(("",0)); print(s.getsockname()[1]); s.close()')}
mkdir -p "$D"
# synthetic .tfsim at Morgan-like sparsity; reused across runs if present
PYTHONPATH=/root/repo:$PYTHONPATH python tools/fold_scale.py \
    --generate_only --rows "$ROWS" --and_slabs 4 --dir "$D"
LIB="$D/rows${ROWS}_d4.tfsim"
python - "$D" "$LIB" <<'PY'
import sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
from gpusimilarity_tpu.utils.tfsim import load_native
data = load_native(sys.argv[2])
np.save(sys.argv[1] + "/qs.npy", np.asarray(data.fingerprints[:64]))
print("queries sampled", flush=True)
PY
PYTHONPATH=/root/repo:$PYTHONPATH \
python -m gpusimilarity_tpu.cli.server "$LIB" --port "$PORT" \
    --max_batch 64 --batch_window_ms 5 --warmup_ks 128 --warmup_batch 32 \
    > "$D/server.log" 2>&1 &
SRV=$!
trap 'kill $SRV 2>/dev/null' EXIT
up=0
for i in $(seq 1 1800); do
    curl -s "http://localhost:$PORT/healthz" >/dev/null 2>&1 && up=1 && break
    kill -0 $SRV 2>/dev/null || { echo "server died"; tail -20 "$D/server.log"; exit 1; }
    sleep 2
done
if [ "$up" != 1 ]; then echo "server never came up"; tail -5 "$D/server.log"; exit 1; fi
echo "server up after load+warmup"
LOADTEST_PORT=$PORT LOADTEST_ROWS=$ROWS python - "$D" <<'PY'
import os, sys, numpy as np, urllib.request, urllib.parse, json, time
import concurrent.futures as cf
PORT = os.environ["LOADTEST_PORT"]
ROWS = int(os.environ["LOADTEST_ROWS"])
qs = np.load(sys.argv[1] + "/qs.npy")
DB = json.loads(urllib.request.urlopen(
    f"http://localhost:{PORT}/healthz", timeout=60).read())["databases"][0]

def query(i, timeout=1800):
    # dbkeys must match the library's key ('scale', set by fold_scale.py's
    # generator) — the registry answers a mismatched key with zero results,
    # same contract as the reference server.
    body = urllib.parse.urlencode({"fp_hex": qs[i % 64].tobytes().hex(),
        "return_count": 10, "similarity_cutoff": 0, "dbnames": DB,
        "dbkeys": "scale"}).encode()
    t0 = time.monotonic()
    # retry transient connection drops; latency keeps counting from the
    # first attempt, so any retry shows up honestly in the percentiles
    for attempt in range(4):
        try:
            with urllib.request.urlopen(urllib.request.Request(
                    f"http://localhost:{PORT}/similarity_search_json",
                    data=body), timeout=timeout) as r:
                p = json.loads(r.read())
            break
        except (ConnectionResetError, ConnectionRefusedError):
            if attempt == 3:
                raise
            time.sleep(0.05 * (attempt + 1))
    # self-match: queries ARE library rows (duplicate folded rows can tie,
    # but the exact id must appear in rank-0's deduped join)
    assert f"SYN{i % 64:010d}" in p["results"][0][0], p["results"][0]
    assert p["results"][0][2] == 1.0
    return time.monotonic() - t0

print("ramping batch buckets (request-thread compiles)...", flush=True)
for b in (1, 2, 4, 8, 16, 32):
    t0 = time.monotonic()
    with cf.ThreadPoolExecutor(b) as ex:
        list(ex.map(query, range(b)))
    print(f"  bucket {b}: {time.monotonic()-t0:.1f}s", flush=True)

N = 256
out = {}
for label in ("cold", "warm"):
    t0 = time.monotonic()
    with cf.ThreadPoolExecutor(32) as ex:
        lat = list(ex.map(lambda i: query(i, 300), range(N)))
    wall = time.monotonic() - t0
    lat.sort()
    out[label] = {"qps": round(N / wall, 1),
                  "p50_ms": round(lat[N // 2] * 1e3),
                  "p95_ms": round(lat[int(N * .95)] * 1e3),
                  "p99_ms": round(lat[int(N * .99)] * 1e3)}
    print(f"LOAD {label}: {N} queries in {wall:.1f}s = {N/wall:.1f} qps; "
          f"p50={out[label]['p50_ms']}ms p95={out[label]['p95_ms']}ms",
          flush=True)
print("LOADTEST104 " + json.dumps({
    "metric": "serving_qps_warm", "value": out["warm"]["qps"], "unit": "qps",
    "rows": ROWS, "clients": 32, "max_batch": 64, **{f"{k}_{m}": v
        for k, d in out.items() for m, v in d.items()}}), flush=True)
PY
curl -s "http://localhost:$PORT/stats" | python -c "import json,sys; s=json.load(sys.stdin); print('server stats: searches =', s['searches'])"
kill $SRV

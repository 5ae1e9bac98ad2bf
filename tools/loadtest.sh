#!/bin/bash
# Sustained concurrent load against the TPU server: 32 clients x 8 queries,
# validating the batching engine end-to-end under contention.
set -e
cd /root/repo
D=$(mktemp -d)
python - "$D" <<'PY'
import sys, numpy as np
from gpusimilarity_tpu.utils.fsim import FingerprintData, write_fsim
rng = np.random.default_rng(5)
n = 1_000_000
bits = rng.random((n, 1024)) < 0.05
packed = np.packbits(bits, axis=1, bitorder="little")
data = FingerprintData(dbkey="", fingerprints=packed,
    smiles=[f"S{i}".encode() for i in range(n)], ids=[f"SYN{i:08d}".encode() for i in range(n)])
write_fsim(sys.argv[1] + "/load.fsim", data)
np.save(sys.argv[1] + "/qs.npy", packed[:64])
print("built", flush=True)
PY
PORT=${LOADTEST_PORT:-8135}
python -m gpusimilarity_tpu.cli.server $D/load.fsim --port $PORT --max_batch 8 --batch_window_ms 5 > $D/server.log 2>&1 &
SRV=$!
# without the trap, any client failure under set -e leaks the server —
# which holds the shared chip's HBM and breaks the next bench run
trap 'kill $SRV 2>/dev/null; rm -rf "$D"' EXIT
up=0
for i in $(seq 1 900); do curl -s http://localhost:$PORT/healthz >/dev/null 2>&1 && up=1 && break; sleep 1; done
if [ "$up" != 1 ]; then echo "server never came up"; tail -5 $D/server.log; exit 1; fi
echo "server up"
LOADTEST_PORT=$PORT python - "$D" <<'PY'
import os, sys, numpy as np, urllib.request, urllib.parse, json, time
PORT = os.environ.get("LOADTEST_PORT", "8135")
import concurrent.futures as cf
qs = np.load(sys.argv[1] + "/qs.npy")

def query(i, timeout=900):
    body = urllib.parse.urlencode({"fp_hex": qs[i % 64].tobytes().hex(),
        "return_count": 10, "similarity_cutoff": 0, "dbnames": "load"}).encode()
    t0 = time.monotonic()
    with urllib.request.urlopen(urllib.request.Request(
            f"http://localhost:{PORT}/similarity_search_json", data=body), timeout=timeout) as r:
        p = json.loads(r.read())
    assert p["results"][0][0] == f"SYN{i % 64:08d}", p["results"][0]
    assert p["results"][0][2] == 1.0
    return time.monotonic() - t0

# warm all bucket shapes sequentially-ish first (compiles: 1,2,4,8)
print("warming (compiles)...", flush=True)
for batchsize in (1, 2, 4, 8):
    with cf.ThreadPoolExecutor(batchsize) as ex:
        list(ex.map(query, range(batchsize)))
    print("  bucket", batchsize, "compiled", flush=True)

N = 256
for label in ("cold", "warm"):
    # first pass soaks relay/dispatch cold-start stalls; the warm pass is
    # the steady-state number (observed: cold 14-35 qps with multi-second
    # relay stalls, warm 150-170 qps)
    t0 = time.monotonic()
    with cf.ThreadPoolExecutor(32) as ex:
        lat = list(ex.map(lambda i: query(i, 120), range(N)))
    wall = time.monotonic() - t0
    lat.sort()
    print(f"LOAD {label}: {N} queries in {wall:.1f}s = {N/wall:.1f} qps; "
          f"p50={lat[N//2]*1e3:.0f}ms p99={lat[int(N*0.99)]*1e3:.0f}ms",
          flush=True)
PY
curl -s http://localhost:$PORT/stats | python -c "import json,sys; s=json.load(sys.stdin); print('server stats: searches =', s['searches'])"
kill $SRV

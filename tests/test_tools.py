"""Smoke tests for the repo tools (scale demo, accuracy study).

Each tool is driven as a subprocess at miniature scale on the CPU backend,
asserting its JSON contract and exactness checks hold — so the tools that
produced the recorded PARITY.md numbers can't silently bit-rot.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=600):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, *args], cwd=REPO, env=env, timeout=timeout,
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout.strip().splitlines()


class TestFoldScale:
    def test_dense_miniature(self, tmp_path):
        lines = _run([
            "tools/fold_scale.py", "--cpu", "--rows", "65536",
            "--queries", "2", "--fold", "2", "--dir", str(tmp_path),
        ])
        payload = json.loads(lines[-1])
        assert payload["exact_self_match"] == "2/2"
        assert payload["fold"] == 2
        assert payload["rows"] == 65536

    def test_sparse_bitplane_miniature(self, tmp_path):
        lines = _run([
            "tools/fold_scale.py", "--cpu", "--rows", "65536",
            "--queries", "2", "--fold", "2", "--mode", "bitplane",
            "--and_slabs", "4", "--dir", str(tmp_path),
        ])
        payload = json.loads(lines[-1])
        assert payload["exact_self_match"] == "2/2"
        assert payload["mode"] == "bitplane"


class TestFoldAccuracy:
    def test_clustered_miniature(self):
        lines = _run([
            "tools/fold_accuracy.py", "--rows", "20000",
            "--queries", "4", "--folds", "2,4",
        ])
        payload = json.loads(lines[-1])
        # clustered data keeps folded search exact at small folds
        assert payload["fold2_mismatch_pct"] == 0.0
        assert payload["data"] == "clustered"

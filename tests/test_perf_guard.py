"""Step-time regression guard for the DFT-path TPU wins (VERDICT r2 #8).

Runs ``bench.py --guard`` in a clean subprocess on the session TPU and
fails if the Darcy S=211 train step regresses past the pinned round-3 band
(bench.GUARD_LIMITS_MS): bf16 15.0 ms, f32 24.2 ms, +30% relay jitter.

The fast suite forces an 8-CPU mesh (conftest.py) where step *times* mean
nothing, and the session TPU allows only one process at a time (CLAUDE.md),
so this is opt-in: ``UNO_TPU_PERF_GUARD=1 python -m pytest tests/
-m slow -k perf_guard`` when the TPU is idle.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("UNO_TPU_PERF_GUARD") != "1",
    reason="needs the (single-process) session TPU: UNO_TPU_PERF_GUARD=1",
)
def test_darcy_step_time_within_round3_band():
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    # the axon backend registers via the session site dir (CLAUDE.md)
    env["PYTHONPATH"] = "/root/.axon_site:" + REPO
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--guard"],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
        env=env,
    )
    lines = [
        json.loads(ln)
        for ln in proc.stdout.splitlines()
        if ln.startswith('{"guard"')
    ]
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert len(lines) == 2 and all(r["ok"] for r in lines), lines

"""REAL multi-process distributed execution (VERDICT r2 #4): a 2-process CPU
cluster via jax.distributed.initialize — cross-process collectives, global
mesh spanning both processes, process_index grid sharding. The heavy lifting
lives in tools/multihost_smoke.py (also runnable standalone); this test
drives its parent entry in-process via subprocess so the suite proves the
multi-host code path executes, not just compiles."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_cluster_dp_and_grid_sharding():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_smoke.py")],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "MULTIHOST SMOKE OK" in proc.stdout, proc.stdout[-2000:]

"""Two-process multi-host runtime in CI (VERDICT r4 item: the
`jax.distributed` path existed but nothing exercised multi-process in CI).

Spawns the scripts/launch_multihost.py simulation: 2 processes x 2 virtual
CPU devices each, wired into one JAX distributed runtime, running one
landmark-sharded distributed BA solve over the GLOBAL 4-device mesh.  Both
workers must agree on the replicated camera-block checksum.
"""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.timeout(600)
def test_two_process_distributed_ba():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "launch_multihost.py"),
         "--nprocs", "2", "--devices-per-proc", "2", "--port", "9917"],
        capture_output=True, text=True, timeout=560)
    sys.stdout.write(out.stdout[-2000:])
    sys.stderr.write(out.stderr[-2000:])
    assert out.returncode == 0, f"launcher failed rc={out.returncode}"
    assert "multihost simulation OK" in out.stdout
    sums = re.findall(r"cam checksum (-?\d+\.\d+)", out.stdout)
    assert len(sums) == 2, out.stdout
    assert sums[0] == sums[1], f"cross-process divergence: {sums}"

"""Multi-process distributed runtime test (VERDICT round-1 item 2).

Spawns 2 real OS processes x 4 virtual CPU devices each via
``scripts/launch_distributed.py``; the workers bring up
``jax.distributed`` (Gloo CPU collectives), build one global
{patch: 4, band: 2} mesh spanning both processes, and run a full
band+patch-sharded LRS-PnP outer step at the reference geometry
(36x36x128), asserting equality with a purely local step.
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_dryrun():
    cmd = [
        sys.executable, "-u",
        os.path.join(_REPO, "scripts", "launch_distributed.py"),
        "--nproc", "2", "--devices-per-proc", "4",
        "--coordinator", "localhost:47613",
        "--timeout", "420",
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=480, env=env, cwd=_REPO
    )
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    assert "multiprocess_dryrun ok: processes=2" in out.stdout
    assert "mesh={'patch': 4, 'band': 2}" in out.stdout

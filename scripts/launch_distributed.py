"""Multi-process launcher / worker for the distributed solver runtime.

Two modes:

* **Launcher** (default): spawn ``--nproc`` local worker processes, each
  a JAX process with ``--devices-per-proc`` virtual CPU devices, wired to
  one coordinator — the faithful CPU stand-in for an N-host TPU pod
  (SURVEY §2.5 "Communication backend"; the capability the reference's
  ``parfor`` at ``main_LRS_PnP.m:100`` is scaled up into).

      python scripts/launch_distributed.py --nproc 2 --devices-per-proc 4

* **Worker** (``--process-id`` given): initialize the distributed
  runtime and run the band+patch-sharded dryrun.  On a real pod each
  host runs this with its own ``--process-id`` (or relies on TPU
  auto-detection by passing no coordinator at all).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(args) -> None:
    sys.path.insert(0, _REPO_ROOT)
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from lrs_pnp_dip_tpu.parallel.distributed import initialize, multiprocess_dryrun

    initialize(
        coordinator_address=args.coordinator,
        num_processes=args.nproc,
        process_id=args.process_id,
    )
    multiprocess_dryrun()


def launch(args) -> int:
    env_base = dict(os.environ)
    # replace (not just prepend) any inherited device-count flag — with
    # duplicates XLA honours the last one
    inherited = [
        f for f in env_base.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    env_base["XLA_FLAGS"] = " ".join(
        [f"--xla_force_host_platform_device_count={args.devices_per_proc}"]
        + inherited
    )
    procs = []
    for pid in range(args.nproc):
        cmd = [
            sys.executable, "-u", os.path.abspath(__file__),
            "--coordinator", args.coordinator,
            "--nproc", str(args.nproc),
            "--process-id", str(pid),
            "--platform", args.platform,
        ]
        procs.append(subprocess.Popen(cmd, env=env_base))
    rc = 0
    for p in procs:
        try:
            rc |= p.wait(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()  # exact child PID we spawned, never a pattern
            rc |= 1
    print(f"launch_distributed: {'ok' if rc == 0 else 'FAILED'} "
          f"({args.nproc} processes x {args.devices_per_proc} devices)")
    return rc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--coordinator", default="localhost:47321")
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "auto"])
    ap.add_argument("--timeout", type=int, default=600)
    args = ap.parse_args()
    if args.process_id is not None:
        worker(args)
        return 0
    return launch(args)


if __name__ == "__main__":
    sys.exit(main())

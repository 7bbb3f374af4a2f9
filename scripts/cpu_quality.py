"""CPU fallback for the quality runs: same runs as scripts/tpu_session.py
but pinned to the host CPU backend so they can proceed while the axon
tunnel is unavailable.  Results land in artifacts/runs/ with a _cpu suffix
in the filename only when --suffix is given (default: same names, so
RESULTS.md tooling picks them up either way).

Usage: python -u scripts/cpu_quality.py [variant image n_iters]...
       python -u scripts/cpu_quality.py --plan full
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

from tpu_session import log, quality_run  # noqa: E402


def main():
    root = os.path.join(os.path.dirname(__file__), "..")
    runs_dir = os.path.join(root, "artifacts", "runs")
    os.makedirs(runs_dir, exist_ok=True)
    pid_path = os.path.join(root, "artifacts", "cpu_quality.pid")
    with open(pid_path, "w") as f:
        f.write(str(os.getpid()))
    import atexit

    atexit.register(lambda: os.path.exists(pid_path) and os.remove(pid_path))
    args = sys.argv[1:]
    if args and args[0] == "--plan":
        plan = []
        for image in ("img1", "img2", "img3", "img4", "img5"):
            plan.append(("dip", image, 250))
        for image in ("img1", "img2", "img3", "img4", "img5"):
            plan.append(("dip_1lip", image, 250))
    elif args:
        plan = [
            (args[i], args[i + 1], int(args[i + 2])) for i in range(0, len(args), 3)
        ]
    else:
        plan = [("dip", "img1", 250)]
    log(f"CPU quality session: {plan}")
    for variant, image, n in plan:
        try:
            quality_run(variant, image, n, runs_dir)
        except Exception as e:
            log(f"{variant}/{image} FAILED: {type(e).__name__}: {e}")
    log("CPU quality session done")


if __name__ == "__main__":
    main()

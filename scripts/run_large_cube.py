"""Large tiled-cube workload (BASELINE config 5): band+patch-scale solve.

Builds a synthetic H x W x B cube much larger than the 36x36 reference
crops, and runs the LRS-PnP solver sharded over a mesh — pixel rows and
blocks over ``patch`` (Gram-psum SVT + shard_map sparse prox).  On a real
pod slice run under ``jax.distributed``; on one host this exercises the
identical program over local devices (or the virtual CPU mesh via
``XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_FORCE_CPU=1``).

Prints per-iteration wall time and block-ISTA throughput so scaling
efficiency can be measured across mesh sizes.
"""

import argparse
import faulthandler
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
faulthandler.register(signal.SIGUSR1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=144)
    ap.add_argument("--width", type=int, default=144)
    ap.add_argument("--bands", type=int, default=128)
    ap.add_argument("--atoms", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--nit", type=int, default=100)
    ap.add_argument("--patch-devices", type=int, default=0,
                    help="0 = all local devices on the patch axis")
    ap.add_argument("--force-cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.force_cpu or os.environ.get("JAX_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from lrs_pnp_dip_tpu.data import random_dictionary
    from lrs_pnp_dip_tpu.data.masks import synthetic_sample
    from lrs_pnp_dip_tpu.ops.blocks import block_grid
    from lrs_pnp_dip_tpu.ops.ista import SparseProxConfig
    from lrs_pnp_dip_tpu.parallel import ShardedSolver, make_mesh
    from lrs_pnp_dip_tpu.utils.config import lrs_pnp_preset

    n_dev = args.patch_devices or len(jax.devices())
    mesh = make_mesh({"data": 1, "patch": n_dev}, devices=jax.devices()[:n_dev])

    sample = synthetic_sample(args.height, args.width, args.bands, missing=0.05)
    D = random_dictionary(36 * 36, args.atoms, seed=0)
    cfg = lrs_pnp_preset(
        outer_iters=args.iters,
        sparse=SparseProxConfig(n_iter=args.nit, alpha_mode="specnorm", h_scale=0.1),
    )
    grid = block_grid((args.height * args.width, args.bands), 36, 36)
    print(
        f"cube {args.height}x{args.width}x{args.bands}: {grid.n_blocks} blocks, "
        f"mesh patch={n_dev}", flush=True,
    )

    solver = ShardedSolver(sample, D, cfg, mesh)
    state = solver.init_state()
    # warmup/compile
    t0 = time.perf_counter()
    state, aux = solver.step(state)
    jax.block_until_ready(state.X)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        state, aux = solver.step(state)
        jax.block_until_ready(state.X)
        dt = time.perf_counter() - t0
        times.append(dt)
        print(
            f"iter {i}: {dt:.3f}s  mpsnr {float(aux.mpsnr):.3f}  "
            f"({grid.n_blocks * args.nit / dt:,.0f} block-iters/s)", flush=True,
        )
    best = min(times)
    print(
        f"best step {best:.3f}s = {grid.n_blocks * args.nit / best:,.0f} "
        f"block-iters/s on {n_dev} devices", flush=True,
    )


if __name__ == "__main__":
    main()

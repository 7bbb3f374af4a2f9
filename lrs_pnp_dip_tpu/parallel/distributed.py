"""Multi-process (multi-host) runtime bootstrap.

The reference is a single Python process; its only parallelism is the
MATLAB ``parfor`` over sparse-coding blocks (``main_LRS_PnP.m:100``).
This module is the framework's scale-out counterpart (SURVEY §2.5
"Communication backend" row): a thin, env-aware wrapper over
``jax.distributed.initialize`` plus helpers to lift host-resident arrays
onto a process-spanning mesh.  On a TPU pod slice the same entry points
run with no arguments (JAX discovers the slice topology); on CPU the
coordinator/process-count triple is passed explicitly, which is how the
2-process x 4-virtual-device dryrun (``scripts/launch_distributed.py``,
``tests/test_multiprocess.py``) validates the code path without pod
hardware.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

import jax

from .mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Start the JAX distributed runtime.

    Arguments fall back to the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``); with everything absent (single process, e.g. a
    standalone TPU VM) this is a no-op so callers can use one entry point
    everywhere.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    return jax.process_index() == 0


def host_to_global(full: np.ndarray, sharding) -> jax.Array:
    """Lift a host-resident *global* array (same value on every process)
    onto a process-spanning sharding: each device fetches only its own
    slice, so no process ever ships another host's shard."""
    full = np.asarray(full)
    return jax.make_array_from_callback(
        full.shape, sharding, lambda idx: full[idx]
    )


def fully_replicate(x: jax.Array, mesh) -> np.ndarray:
    """Gather a (possibly non-addressable) mesh-sharded array to every
    process as a host numpy array — one all-gather over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))(x)
    return np.asarray(rep)


def default_axes(n_devices: int) -> Dict[str, int]:
    """Mesh layout used by the dryruns: a 2-D {patch, band} mesh whenever
    the device count allows it, else pure patch sharding."""
    if n_devices % 2 == 0 and n_devices > 1:
        return {"patch": n_devices // 2, "band": 2}
    return {"patch": n_devices}


def multiprocess_dryrun(verbose: bool = True) -> float:
    """Run one band+patch-sharded LRS-PnP outer step at the reference
    geometry (36x36x128 cube, 36x36 blocks; ``main_LRS_PnP_DIP_pro.py:306``)
    over ALL global devices — across processes when the distributed
    runtime is up — and verify it against a purely local single-device
    step.  Returns the max |X_sharded - X_local| discrepancy.
    """
    from ..data import random_dictionary
    from ..data.masks import synthetic_sample
    from ..ops.ista import SparseProxConfig
    from ..solvers import Solver
    from ..utils.config import SolverConfig
    from .engine import ShardedSolver

    devices = jax.devices()
    mesh = make_mesh(default_axes(len(devices)), devices)
    sample = synthetic_sample(height=36, width=36, bands=128, missing=0.1, seed=0)
    D = random_dictionary(36 * 36, 128, seed=0)
    cfg = SolverConfig(
        variant="lrs_pnp",
        outer_iters=1,
        block_size=36,
        stride=36,
        sparse=SparseProxConfig(n_iter=4, backend="xla"),
        dip=None,
    )
    sharded = ShardedSolver(sample, D, cfg, mesh)
    state, aux = sharded.step(sharded.init_state())
    X = fully_replicate(state.X, mesh)
    assert np.isfinite(X).all(), "sharded step produced non-finite state"

    local = Solver(sample, D, cfg)
    st_local, _ = local.step(local.init_state())
    diff = float(np.max(np.abs(X - np.asarray(st_local.X))))
    if verbose and is_primary():
        print(
            f"multiprocess_dryrun ok: processes={jax.process_count()}, "
            f"devices={len(devices)}, mesh={dict(zip(mesh.axis_names, mesh.devices.shape))}, "
            f"X={X.shape}, mpsnr={float(np.asarray(aux.mpsnr)):.3f}, "
            f"max|X_sharded-X_local|={diff:.2e}",
            flush=True,
        )
    assert diff < 5e-4, f"sharded step diverged from local step by {diff}"
    return diff

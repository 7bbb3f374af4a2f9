"""Mesh-sharded solver engine.

Wraps the same pure outer-step from :mod:`..solvers.admm` with mesh
shardings: iterate rows over ``patch``, samples over ``data``, dictionary
replicated.  GSPMD inserts the collectives (block extraction straddles
pixel shards -> halo all-gathers; the SVT Gram uses the explicit
``psum`` route from :mod:`.collectives` when enabled).

On one host this runs over local devices (or the 8-virtual-CPU test
mesh); on a pod slice the same code runs under ``jax.distributed`` with
the mesh spanning all hosts — the ``data`` axis across DCN, ``patch``
within the ICI domain.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import numpy as np
from jax.sharding import Mesh

from ..data.io import HsiSample
from ..solvers.admm import (
    ProblemConsts,
    SolverState,
    build_step,
    init_state,
    make_consts,
)
from ..solvers.batch import stack_consts, stack_states
from ..utils.config import SolverConfig
from .collectives import (
    make_distributed_svt,
    make_distributed_svt_2d,
    make_sharded_sparse_prox,
    make_sharded_sparse_prox_2d,
)
from .sharding import aux_sharding, consts_sharding, state_sharding


class ShardedSolver:
    """Solver jitted over a device mesh; accepts one sample or a batch."""

    def __init__(
        self,
        samples: Union[HsiSample, Sequence[HsiSample]],
        dictionary: np.ndarray,
        config: SolverConfig,
        mesh: Mesh,
        net=None,
        use_collective_svt: bool = True,
    ):
        self.mesh = mesh
        self.config = config
        self.batched = not isinstance(samples, HsiSample)
        samples_list = list(samples) if self.batched else [samples]
        self.samples = samples_list
        self.shape = samples_list[0].shape

        svt_fn = None
        sparse_prox_fn = None
        dip_param_constraint = None
        if "model" in mesh.axis_names and config.variant in ("dip", "dip_1lip"):
            # tensor parallelism: the fresh per-outer-iteration DIP params
            # get channel-sharded over the model axis inside the step
            # (VERDICT r3 #4 — TP as a solver capability, not a sidecar)
            from .tensor import make_channel_constraint

            dip_param_constraint = make_channel_constraint(mesh, "model")
        if not self.batched and "patch" in mesh.axis_names:
            if use_collective_svt and config.variant == "lrs_pnp":
                if "band" in mesh.axis_names:
                    svt_fn = make_distributed_svt_2d(mesh, "patch", "band")
                else:
                    svt_fn = make_distributed_svt(mesh, "patch")
            if "band" in mesh.axis_names:
                # 2-D tiling: block rows over patch, pixel columns (and the
                # dictionary's rows) over band — each device does
                # 1/(p*b) of the ISTA matmul flops, one psum per iteration
                # (was: band groups redundantly recomputing the whole prox)
                sparse_prox_fn = make_sharded_sparse_prox_2d(
                    mesh, config.sparse, "patch", "band"
                )
            else:
                # explicit shard_map over the block axis — lets each shard
                # run the fused Pallas kernel on TPU instead of relying on
                # GSPMD to partition the scan
                sparse_prox_fn = make_sharded_sparse_prox(
                    mesh, config.sparse, "patch"
                )
        else:
            # under vmap, use the XLA scan path and let GSPMD partition it
            import dataclasses as _dc

            if config.sparse.backend == "auto":
                config = _dc.replace(
                    config, sparse=_dc.replace(config.sparse, backend="xla")
                )
                self.config = config

        step = build_step(
            config, self.shape, net=net, svt_fn=svt_fn,
            sparse_prox_fn=sparse_prox_fn,
            dip_param_constraint=dip_param_constraint,
        )
        if self.batched:
            step = jax.vmap(step, in_axes=(0, 0))
            consts = stack_consts(
                [make_consts(s, dictionary, config) for s in samples_list]
            )
        else:
            consts = make_consts(samples_list[0], dictionary, config)

        in_shardings = (
            state_sharding(mesh, self.batched),
            consts_sharding(mesh, self.batched),
        )
        out_shardings = (
            state_sharding(mesh, self.batched),
            aux_sharding(mesh, self.batched),
        )
        self._step = jax.jit(
            step, in_shardings=in_shardings, out_shardings=out_shardings
        )
        self.consts = jax.device_put(consts, in_shardings[1])

    def init_state(self, seed: Optional[int] = None) -> SolverState:
        seed = self.config.seed if seed is None else seed
        if self.batched:
            st = stack_states(
                [init_state(s, seed + i) for i, s in enumerate(self.samples)]
            )
        else:
            st = init_state(self.samples[0], seed)
        return jax.device_put(st, state_sharding(self.mesh, self.batched))

    def step(self, state: SolverState):
        return self._step(state, self.consts)

    def run(self, n_iters: Optional[int] = None, state=None, callback=None):
        n = self.config.outer_iters if n_iters is None else n_iters
        state = self.init_state() if state is None else state
        hist = {"mpsnr": [], "ssim": []}
        for i in range(n):
            state, aux = self.step(state)
            hist["mpsnr"].append(np.asarray(aux.mpsnr))
            hist["ssim"].append(np.asarray(aux.ssim))
            if callback is not None:
                callback(i, state, aux)
        return state, hist

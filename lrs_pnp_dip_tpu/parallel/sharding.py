"""Sharding layouts for the solver pytrees.

Placement policy (SURVEY §2.5 plan):

  * ADMM iterate / duals ``(P, B)``: rows (pixels) sharded over ``patch``
    — the Gram reduction of the SVT then needs exactly one ``psum``;
  * block tensors ``(nB, bb*bb)``: block axis over ``patch`` (the
    sparse prox is embarrassingly parallel there);
  * dictionary ``(bb*bb, K)``: replicated (it is small and every shard
    needs all rows);
  * with a leading sample axis, that axis maps to ``data``.

These are *annotations*: the step function itself stays unchanged and XLA
GSPMD inserts the collectives (all-gathers at the block-extraction
boundary where blocks straddle pixel shards, psums in reductions).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solvers.admm import ProblemConsts, SolverState, StepAux


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return _ns(mesh)


def _band(mesh: Mesh):
    """Trailing-dim axis name for (P, B) matrices: ``band`` when the mesh
    has one (2-D band+patch layout, SURVEY §2.5 SP row), else unsharded."""
    return "band" if "band" in mesh.axis_names else None


def state_sharding(mesh: Mesh, batched: bool = False) -> SolverState:
    """Shardings for SolverState. ``batched`` adds a leading data axis."""
    lead = ("data",) if batched else ()
    mat = _ns(mesh, *lead, "patch", _band(mesh))
    rep = _ns(mesh, *lead) if batched else replicate(mesh)
    return SolverState(X=mat, lambda1=mat, lambda2=mat, key=rep, itr=rep)


def consts_sharding(mesh: Mesh, batched: bool = False) -> ProblemConsts:
    lead = ("data",) if batched else ()
    mat = _ns(mesh, *lead, "patch", _band(mesh))
    blocks = _ns(mesh, *lead, "patch")
    rep = _ns(mesh, *lead) if batched else replicate(mesh)
    return ProblemConsts(
        Y=mat,
        mask2d=mat,
        mask_blocks=blocks,
        D=replicate(mesh),
        clean=rep,
        dip_target=rep,
        dip_mask=rep,
        alpha=blocks,  # (nB,): block axis over patch, like mask_blocks
    )


def aux_sharding(mesh: Mesh, batched: bool = False) -> StepAux:
    lead = ("data",) if batched else ()
    mat = _ns(mesh, *lead, "patch", _band(mesh))
    rep = _ns(mesh, *lead) if batched else replicate(mesh)
    return StepAux(
        mpsnr=rep, ssim=rep, x_dist=rep, l1_dist=rep, l2_dist=rep,
        dip_iters=rep, dip_loss=rep, U=mat, phi_scatter=mat,
    )

"""Closed-form data-fidelity update and dual (Lagrangian) updates.

Reference (``main_LRS_PnP_DIP_pro.py:425-456``; MATLAB
``main_LRS_PnP.m:146-169``):

    X = (gamma M^T Y + mu1 IMout + mu2 U - lambda1_sum - lambda2)
        / (gamma M^T M + mu1 Weight + mu2)

where IMout / lambda1_sum are the *summed* (not averaged) block scatters of
the sparse-prox output and of lambda_1's blocks, and Weight is the per-entry
block coverage count.  The duals then update with the raw summed IMout:

    lambda1 += mu1 (X - IMout);   lambda2 += mu2 (X - U)

(the un-normalised IMout in the dual is a reference quirk we reproduce —
SURVEY A8).  All elementwise on (P, B) arrays; one fused XLA op.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .blocks import BlockGrid, extract_blocks, scatter_blocks


def data_fidelity_update(
    Y: jnp.ndarray,  # (P, B) observed matricized image (M^T Y)
    mask: jnp.ndarray,  # (P, B) observation mask (M^T M diagonal)
    phi_blocks: jnp.ndarray,  # (nB, bb*bb) sparse-prox reconstructed blocks
    U: jnp.ndarray,  # (P, B) low-rank / DIP prox output
    lambda1: jnp.ndarray,
    lambda2: jnp.ndarray,
    grid: BlockGrid,
    gamma: float,
    mu1: float,
    mu2: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (X, IMout). IMout is needed for the lambda1 dual update."""
    im_out = scatter_blocks(phi_blocks, grid)
    weight = grid.weight()
    lambda1_sum = scatter_blocks(extract_blocks(lambda1, grid), grid)
    X = (gamma * Y + mu1 * im_out + mu2 * U - lambda1_sum - lambda2) / (
        gamma * mask + mu1 * weight + mu2
    )
    return X, im_out


def dual_updates(
    lambda1: jnp.ndarray,
    lambda2: jnp.ndarray,
    X: jnp.ndarray,
    im_out: jnp.ndarray,
    U: jnp.ndarray,
    mu1: float,
    mu2: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return lambda1 + mu1 * (X - im_out), lambda2 + mu2 * (X - U)

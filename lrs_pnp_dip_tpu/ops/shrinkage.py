"""Soft-thresholding (the l1 prox).

Matches reference ``Shrinkage_Operator`` / ``soft_thresh``
(``main_LRS_PnP_DIP_pro.py:162-166,185-186``; MATLAB ``soft.m``).
"""

from __future__ import annotations

import jax.numpy as jnp


def soft_threshold(x: jnp.ndarray, tau) -> jnp.ndarray:
    """sign(x) * max(|x| - tau, 0)."""
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - tau, 0.0)

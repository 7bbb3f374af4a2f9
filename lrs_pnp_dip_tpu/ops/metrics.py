"""Image-quality metrics, bit-compatible with the reference formulas.

The reference PSNR is deliberately non-standard:

    psnr = 10 * log10(255 / sqrt(mse))

i.e. 255 (not 255^2) applied to [0, 1]-ranged data (reference
``main_LRS_PnP_DIP_pro.py:54-60`` and the in-loop per-band variant at
``:470-472``).  We reproduce it EXACTLY so MPSNR numbers are comparable
with the figures committed in the reference's ``results/`` tree (e.g. the
hard-coded 33.074 dB input MPSNR at ``:344``, which this module reproduces
on the reference data).  A standard PSNR is provided alongside.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def psnr_ref(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Reference-compatible PSNR: 10*log10(255 / sqrt(mse))."""
    m = mse(a, b)
    return 10.0 * jnp.log10(255.0 / jnp.sqrt(m))


def psnr_standard(a: jnp.ndarray, b: jnp.ndarray, peak: float = 1.0) -> jnp.ndarray:
    """Conventional PSNR = 10*log10(peak^2 / mse)."""
    return 10.0 * jnp.log10(peak * peak / mse(a, b))


def mpsnr(clean: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Mean over spectral bands of per-band reference PSNR.

    Inputs are canonical (H, W, B) cubes (reference computes this per band
    over (36, 36) slices, ``main_LRS_PnP_DIP_pro.py:470-475``).
    """
    m = jnp.mean((clean - pred) ** 2, axis=(0, 1))  # per band
    return jnp.mean(10.0 * jnp.log10(255.0 / jnp.sqrt(m)))


def batch_mpsnr(clean: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Mean MPSNR over a leading batch axis of (N, H, W, B) cubes.

    Reference ``bach_mpsnr`` (``main_LRS_PnP_DIP_pro.py:63-72``).
    """
    m = jnp.mean((clean - pred) ** 2, axis=(1, 2))  # (N, B)
    per_band = 10.0 * jnp.log10(255.0 / jnp.sqrt(m))
    return jnp.mean(per_band)

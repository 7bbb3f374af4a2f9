"""SSIM, reproducing the vendored pytorch_ssim semantics on TPU.

Reference (``pytorch_ssim/__init__.py:7-73``): 11x11 gaussian window
(sigma 1.5, normalised), depthwise 'same' convolution with ZERO padding
(torch ``F.conv2d(padding=5)``), C1 = 0.01^2, C2 = 0.03^2, mean over the
full SSIM map.  The zero padding (rather than the usual 'valid'/shifted
windows) is part of the reference numerics and is kept.

Implementation: one depthwise ``lax.conv_general_dilated`` in NHWC over all
five filtered quantities stacked into the channel axis — a single fused conv
per call instead of five.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    w = np.outer(g, g)
    return np.asarray(w, dtype=np.float32)


def _depthwise_filter(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """NHWC depthwise 'same' (zero-padded) gaussian filtering."""
    c = x.shape[-1]
    w2d = jnp.asarray(_gaussian_window(window_size))
    kernel = jnp.tile(w2d[:, :, None, None], (1, 1, 1, c))  # HWIO, I=1
    pad = window_size // 2
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    size_average: bool = True,
) -> jnp.ndarray:
    """SSIM of two (H, W, B) cubes or (N, H, W, B) batches."""
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1
    )
    f = _depthwise_filter(stacked, window_size)
    c = img1.shape[-1]
    mu1, mu2, s11, s22, s12 = (
        f[..., :c],
        f[..., c : 2 * c],
        f[..., 2 * c : 3 * c],
        f[..., 3 * c : 4 * c],
        f[..., 4 * c :],
    )
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = s11 - mu1_sq
    sigma2_sq = s22 - mu2_sq
    sigma12 = s12 - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))

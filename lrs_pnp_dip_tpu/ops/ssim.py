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


@functools.lru_cache(maxsize=None)
def _band_matrix(n: int, window_size: int, sigma: float = 1.5) -> np.ndarray:
    """(n, n) banded Toeplitz matrix of the zero-padded 'same' 1-D gaussian
    filter: row i holds g centered at i, truncated at the borders — exactly
    the per-axis action of the reference's zero-padded depthwise conv."""
    x = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    pad = window_size // 2
    W = np.zeros((n, n), dtype=np.float32)
    for i in range(n):
        lo = max(0, i - pad)
        hi = min(n, i + pad + 1)
        W[i, lo:hi] = g[lo - (i - pad) : hi - (i - pad)]
    return W


def _depthwise_filter(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """NHWC 'same' (zero-padded) gaussian filtering.

    The gaussian window is separable (``_gaussian_window`` IS the outer
    product of its 1-D profile, reference ``pytorch_ssim/__init__.py:7-16``),
    so the 11x11 depthwise conv factors exactly into two banded-matrix
    contractions — (H,H)@(...) and (W,W)@(...) — which land on the MXU
    instead of lowering to a 121-tap VPU depthwise conv.  At 144x144x128
    the conv formulation dominated the whole outer iteration (round-5
    large-cube stage decomposition); the matmul form is the same math in
    float-reordered arithmetic."""
    wh = jnp.asarray(_band_matrix(x.shape[1], window_size))
    ww = jnp.asarray(_band_matrix(x.shape[2], window_size))
    y = jnp.einsum("hj,njwc->nhwc", wh, x)
    return jnp.einsum("wk,nhkc->nhwc", ww, y)


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


def ssim_matlab(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    border: tuple = (0, 0),
    L: float = 255.0,
    window_size: int = 11,
) -> jnp.ndarray:
    """The MATLAB twin's SSIM (reference ``cal_ssim.m`` wrapping Zhou
    Wang's ``ssim_index``): optional border crop, VALID (un-padded)
    gaussian filtering, dynamic range ``L``, per-channel SSIMs summed and
    divided by 3 — the reference divides by 3 regardless of the actual
    channel count (kept faithfully; pass 3-channel inputs for the sane
    interpretation).  Single-channel input returns the plain index.

    Inputs: (H, W) or (H, W, C) cubes.
    """
    if img1.ndim == 2:
        img1 = img1[..., None]
        img2 = img2[..., None]
    b_row, b_col = border
    h, w, _ = img1.shape
    img1 = img1[b_row : h - b_row if b_row else h, b_col : w - b_col if b_col else w, :]
    img2 = img2[b_row : h - b_row if b_row else h, b_col : w - b_col if b_col else w, :]
    c = img1.shape[-1]
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1
    )[None]
    w2d = jnp.asarray(_gaussian_window(window_size))
    kernel = jnp.tile(w2d[:, :, None, None], (1, 1, 1, 5 * c))
    f = jax.lax.conv_general_dilated(
        stacked, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=5 * c,
    )[0]
    mu1, mu2 = f[..., :c], f[..., c : 2 * c]
    s11 = f[..., 2 * c : 3 * c] - mu1 * mu1
    s22 = f[..., 3 * c : 4 * c] - mu2 * mu2
    s12 = f[..., 4 * c :] - mu1 * mu2
    C1, C2 = (0.01 * L) ** 2, (0.03 * L) ** 2
    smap = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1 * mu1 + mu2 * mu2 + C1) * (s11 + s22 + C2)
    )
    per_channel = jnp.mean(smap, axis=(0, 1))  # per-channel mssim
    if c == 1:
        return per_channel[0]
    return jnp.sum(per_channel) / 3.0

"""Anti-aliased fixed-kernel downsampler (model-zoo component M8).

Re-derived from reference ``models/downsampler.py:5-135``: a strided
depthwise convolution with a fixed analytic kernel — lanczos2/lanczos3,
gauss (sigma by name), or box — phase 0 or 0.5, with optional
replication-padding so output size = input size / factor.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


@functools.lru_cache(maxsize=None)
def get_kernel(factor: int, kernel_type: str, phase: float, kernel_width: int,
               support: int = 0, sigma: float = 0.0) -> np.ndarray:
    """Analytic resampling kernel, normalised to sum 1."""
    assert phase in (0.0, 0.5)
    if phase == 0.5 and kernel_type != "box":
        kernel = np.zeros((kernel_width - 1, kernel_width - 1))
    else:
        kernel = np.zeros((kernel_width, kernel_width))

    if kernel_type == "box":
        assert phase == 0.5
        kernel[:] = 1.0 / (kernel_width * kernel_width)
        return kernel

    center = (kernel_width + 1) / 2.0
    for i in range(1, kernel.shape[0] + 1):
        for j in range(1, kernel.shape[1] + 1):
            if phase == 0.5:
                di = abs(i + 0.5 - center) / factor
                dj = abs(j + 0.5 - center) / factor
            else:
                di = abs(i - center) / factor
                dj = abs(j - center) / factor
            if kernel_type == "gauss":
                val = np.exp(-(di * di + dj * dj) / (2 * sigma * sigma))
                val /= 2.0 * np.pi * sigma * sigma
            elif kernel_type == "lanczos":
                val = 1.0
                for d in (di, dj):
                    if d != 0:
                        pd = np.pi * d
                        val *= support * np.sin(pd) * np.sin(pd / support) / (pd * pd)
            else:
                raise ValueError(kernel_type)
            kernel[i - 1, j - 1] = val
    return kernel / kernel.sum()


def _resolve(kernel_type: str, factor: int):
    if kernel_type == "lanczos2":
        return "lanczos", 2, 4 * factor + 1, 0.0
    if kernel_type == "lanczos3":
        return "lanczos", 3, 6 * factor + 1, 0.0
    if kernel_type == "gauss12":
        return "gauss", 0, 7, 1.0 / 2.0
    if kernel_type == "gauss1sq2":
        return "gauss", 0, 9, 1.0 / np.sqrt(2.0)
    if kernel_type == "box":
        return "box", 0, factor, 0.0
    raise ValueError(kernel_type)


class Downsampler(nn.Module):
    factor: int = 2
    kernel_type: str = "lanczos2"
    phase: float = 0.5
    preserve_size: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        base, support, width, sigma = _resolve(self.kernel_type, self.factor)
        k = get_kernel(self.factor, base, self.phase, width, support, sigma)
        c = x.shape[-1]
        kernel = jnp.tile(jnp.asarray(k, jnp.float32)[:, :, None, None], (1, 1, 1, c))
        if self.preserve_size:
            if k.shape[0] % 2 == 1:
                pad = (k.shape[0] - 1) // 2
                pads = [(pad, pad), (pad, pad)]
            else:
                pad = (k.shape[0] - self.factor) // 2
                pads = [(pad, pad + 1), (pad, pad + 1)]
            x = jnp.pad(x, [(0, 0)] + pads + [(0, 0)], mode="edge")
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.factor, self.factor),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

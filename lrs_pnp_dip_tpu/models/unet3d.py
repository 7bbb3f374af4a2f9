"""Volumetric 3-D U-Net for treating the HSI cube as a (1, D, H, W, 1)
volume (model-zoo component M12; reference ``models/unet3D.py:32-192``).

NDHWC layout; Conv3D + max-pool downs, trilinear x2 ups with skip concats.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import pad_input


class _Conv3Block(nn.Module):
    features: int
    norm: bool = True

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3, 3), padding="SAME")(x)
            if self.norm:
                c = x.shape[-1]
                scale = self.param(f"bn_scale_{i}", nn.initializers.ones, (c,))
                bias = self.param(f"bn_bias_{i}", nn.initializers.zeros, (c,))
                axes = tuple(range(x.ndim - 1))
                x = (x - jnp.mean(x, axes)) / jnp.sqrt(jnp.var(x, axes) + 1e-5)
                x = x * scale + bias
            x = nn.relu(x)
        return x


def _upsample3d(x):
    n, d, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * d, 2 * h, 2 * w, c), method="trilinear")


class UNet3D(nn.Module):
    num_output_channels: int = 1
    feature_scale: int = 4
    need_sigmoid: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = [64 // self.feature_scale * s for s in (1, 2, 4, 8)]
        pool = lambda y: nn.max_pool(y, (2, 2, 2), strides=(2, 2, 2))

        d1 = _Conv3Block(f[0])(x)
        d2 = _Conv3Block(f[1])(pool(d1))
        d3 = _Conv3Block(f[2])(pool(d2))
        bott = _Conv3Block(f[3])(pool(d3))

        def up(y, skip, feats):
            y = _upsample3d(y)
            # center-crop to skip's spatial size
            sl = []
            for ax in (1, 2, 3):
                diff = y.shape[ax] - skip.shape[ax]
                lo = diff // 2
                sl.append((lo, lo + skip.shape[ax]))
            y = y[:, sl[0][0]:sl[0][1], sl[1][0]:sl[1][1], sl[2][0]:sl[2][1], :]
            y = jnp.concatenate([y, skip], axis=-1)
            return _Conv3Block(feats)(y)

        y = up(bott, d3, f[2])
        y = up(y, d2, f[1])
        y = up(y, d1, f[0])
        y = nn.Conv(self.num_output_channels, (1, 1, 1))(y)
        if self.need_sigmoid:
            y = nn.sigmoid(y)
        return y

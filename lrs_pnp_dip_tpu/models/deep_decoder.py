"""Deep-decoder networks (model-zoo component M14).

Re-derived from reference ``include/decoder.py:10-127``: an
under-parameterised decoder-only net — per scale a 1x1 conv, x2 bilinear
upsample, ReLU, BN; plus a residual variant whose scales are 1x1-conv
residual blocks.  Used by the reference's "DeepDecoder" spectrum-comparison
runs (``results/spectrum/DeepDecoder/``).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import BatchNorm2d, Conv2d, upsample2x


class DeepDecoder(nn.Module):
    num_output_channels: int = 3
    channels: Sequence[int] = (128, 128, 128, 128, 128)
    need_sigmoid: bool = True
    upsample_first: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x
        for c in self.channels:
            if self.upsample_first:
                y = Conv2d(c, 1)(y)
                y = upsample2x(y, "bilinear")
            else:
                y = upsample2x(y, "bilinear")
                y = Conv2d(c, 1)(y)
            y = nn.relu(y)
            y = BatchNorm2d()(y)
        y = Conv2d(self.num_output_channels, 1)(y)
        if self.need_sigmoid:
            y = nn.sigmoid(y)
        return y


class _ResBlock1x1(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = Conv2d(self.features, 1)(x)
        y = BatchNorm2d()(y)
        y = nn.relu(y)
        y = Conv2d(self.features, 1)(y)
        y = BatchNorm2d()(y)
        if x.shape[-1] != self.features:
            x = Conv2d(self.features, 1)(x)
        return nn.relu(x + y)


class ResDecoder(nn.Module):
    num_output_channels: int = 3
    channels: Sequence[int] = (128, 128, 128, 128, 128)
    need_sigmoid: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x
        for c in self.channels:
            y = _ResBlock1x1(c)(y)
            y = upsample2x(y, "bilinear")
            y = BatchNorm2d()(y)
        y = Conv2d(self.num_output_channels, 1)(y)
        if self.need_sigmoid:
            y = nn.sigmoid(y)
        return y

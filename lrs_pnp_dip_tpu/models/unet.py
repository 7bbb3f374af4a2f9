"""Classic U-Net with true skip concatenations (model-zoo option 'UNet').

Re-derived from reference ``models/unet.py:32-201``: 4 down / 4 up scales
with filter counts [64,128,256,512,1024] divided by ``feature_scale``,
optional input-pyramid concatenation (``concat_x``), up-path via bilinear
(or nearest) x2 upsampling + conv, and an optional sigmoid head.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import BatchNorm2d, Conv2d, concat_center_crop, upsample2x


class _UnetConv2(nn.Module):
    features: int
    norm: bool = True
    pad: str = "zero"

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = Conv2d(self.features, 3, pad=self.pad)(x)
            if self.norm:
                x = BatchNorm2d()(x)
            x = nn.relu(x)
        return x


class _UnetUp(nn.Module):
    features: int
    upsample_mode: str = "bilinear"
    pad: str = "zero"
    same_num_filt: bool = False

    @nn.compact
    def __call__(self, x, skip):
        x = upsample2x(x, self.upsample_mode)
        x = Conv2d(self.features, 3, pad=self.pad)(x)
        y = concat_center_crop([x, skip])
        return _UnetConv2(self.features, pad=self.pad)(y)


class UNet(nn.Module):
    num_output_channels: int = 3
    feature_scale: int = 4
    upsample_mode: str = "bilinear"
    pad: str = "zero"
    norm: bool = True
    need_sigmoid: bool = True
    concat_x: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        filters = [64 // self.feature_scale * s for s in (1, 2, 4, 8, 16)]

        pyramid = [x]
        if self.concat_x:
            cur = x
            for _ in range(4):
                cur = nn.avg_pool(cur, (2, 2), strides=(2, 2))
                pyramid.append(cur)

        def maybe_cat(y, level):
            if self.concat_x:
                return concat_center_crop([y, pyramid[level]])
            return y

        d1 = _UnetConv2(filters[0], self.norm, self.pad)(maybe_cat(x, 0))
        y = nn.max_pool(d1, (2, 2), strides=(2, 2))
        d2 = _UnetConv2(filters[1], self.norm, self.pad)(maybe_cat(y, 1))
        y = nn.max_pool(d2, (2, 2), strides=(2, 2))
        d3 = _UnetConv2(filters[2], self.norm, self.pad)(maybe_cat(y, 2))
        y = nn.max_pool(d3, (2, 2), strides=(2, 2))
        d4 = _UnetConv2(filters[3], self.norm, self.pad)(maybe_cat(y, 3))
        y = nn.max_pool(d4, (2, 2), strides=(2, 2))
        y = _UnetConv2(filters[4], self.norm, self.pad)(maybe_cat(y, 4))

        y = _UnetUp(filters[3], self.upsample_mode, self.pad)(y, d4)
        y = _UnetUp(filters[2], self.upsample_mode, self.pad)(y, d3)
        y = _UnetUp(filters[1], self.upsample_mode, self.pad)(y, d2)
        y = _UnetUp(filters[0], self.upsample_mode, self.pad)(y, d1)

        y = Conv2d(self.num_output_channels, 1, pad=self.pad)(y)
        if self.need_sigmoid:
            y = nn.sigmoid(y)
        return y

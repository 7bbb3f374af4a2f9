"""Texture-nets multi-scale generator (model-zoo option 'texture_nets').

Re-derived from reference ``models/texture_nets.py:17-79``: a pyramid of
downsample ratios (default [32,16,8,4,2,1]); each scale processes an
avg-pooled copy of the input through three conv+BN+act stacks (3x3, 3x3,
1x1); scales merge coarsest-to-finest by BN -> concat -> x2 upsample,
ending in a 1x1 conv head.  (The reference file has py2-era float-padding
bugs; this is the intended architecture with sound padding.)
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import BatchNorm2d, Conv2d, activation, concat_center_crop, upsample2x


class TextureNet(nn.Module):
    num_output_channels: int = 3
    ratios: Sequence[int] = (32, 16, 8, 4, 2, 1)
    fill_noise: bool = False
    pad: str = "zero"
    need_sigmoid: bool = True
    conv_num: int = 8
    act_fun: str = "LeakyReLU"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = activation(self.act_fun)

        def scale_branch(inp):
            y = inp
            for k in (3, 3, 1):
                y = Conv2d(self.conv_num, k, pad=self.pad)(y)
                y = BatchNorm2d()(y)
                y = act(y)
            return y

        merged = None
        for ratio in self.ratios:  # coarsest first
            inp = x
            if ratio > 1:
                inp = nn.avg_pool(x, (ratio, ratio), strides=(ratio, ratio))
            branch = scale_branch(inp)
            if merged is None:
                merged = branch
            else:
                merged = concat_center_crop(
                    [BatchNorm2d()(merged), BatchNorm2d()(branch)]
                )
                for k in (3, 3, 1):
                    merged = Conv2d(self.conv_num, k, pad=self.pad)(merged)
                    merged = BatchNorm2d()(merged)
                    merged = act(merged)
            if ratio > 1:
                merged = upsample2x(merged, "nearest")
        y = Conv2d(self.num_output_channels, 1, pad=self.pad)(merged)
        if self.need_sigmoid:
            y = nn.sigmoid(y)
        return y

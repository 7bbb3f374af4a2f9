"""ResNet DIP variant (model-zoo option 'ResNet').

Re-derived from reference ``models/resnet.py:9-97``: stem conv+act, N
residual blocks (conv-BN-act-conv-BN with center-crop residual add), tail
conv + BN + final 1x1 conv + sigmoid.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .common import BatchNorm2d, Conv2d, activation


class _ResidualBlock(nn.Module):
    features: int
    act_fun: str
    pad: str

    @nn.compact
    def __call__(self, x):
        act = activation(self.act_fun)
        y = Conv2d(self.features, 3, pad=self.pad)(x)
        y = act(BatchNorm2d()(y))
        y = Conv2d(self.features, 3, pad=self.pad)(y)
        y = BatchNorm2d()(y)
        # center-crop residual add (reference ResidualSequential.forward)
        if y.shape[1] != x.shape[1] or y.shape[2] != x.shape[2]:
            dh = (x.shape[1] - y.shape[1]) // 2
            dw = (x.shape[2] - y.shape[2]) // 2
            x = x[:, dh : dh + y.shape[1], dw : dw + y.shape[2], :]
        return x + y


class ResNet(nn.Module):
    num_output_channels: int = 3
    num_blocks: int = 8
    num_channels: int = 32
    act_fun: str = "LeakyReLU"
    need_sigmoid: bool = True
    pad: str = "reflection"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = activation(self.act_fun)
        y = Conv2d(self.num_channels, 3, stride=1, pad=self.pad)(x)
        y = act(y)
        for _ in range(self.num_blocks):
            y = _ResidualBlock(self.num_channels, self.act_fun, self.pad)(y)
        y = Conv2d(self.num_channels, 3, pad=self.pad)(y)
        y = BatchNorm2d()(y)
        y = Conv2d(self.num_output_channels, 1, pad=self.pad)(y)
        if self.need_sigmoid:
            y = nn.sigmoid(y)
        return y

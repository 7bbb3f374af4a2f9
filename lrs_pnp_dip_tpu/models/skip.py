"""The `skip` hourglass — the flagship DIP network.

Structure re-derived from reference ``models/skip.py:5-99`` (used by the
LRS-PnP-DIP main with 128->128 channels, 5 scales, all widths 128,
reflection padding, LeakyReLU, ``main_LRS_PnP_DIP_pro.py:215-221``):

per scale i (outermost to innermost):
    y = concat_center_crop( skip_i(x), deeper_i(x) )       # if skip ch > 0
    y = BN(y)
    y = act(BN(conv3x3(y)))                                # filter_size_up
    y = act(BN(conv1x1(y)))                                # if need1x1_up
with
    skip_i   = act(BN(conv1x1(x)))
    deeper_i = upsample2x( [inner scales]( act(BN(conv3x3(act(BN(
               conv3x3_stride2(x))))))) )
head: conv1x1 -> sigmoid.

Implemented recursively with static Python recursion (unrolled at trace
time) — each scale's spatial extent is static, so the center-crop concat
lowers to static slices and XLA fuses the whole pyramid.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from .common import BatchNorm2d, Conv2d, activation, concat_center_crop, upsample2x


def _as_list(v, n):
    if isinstance(v, (list, tuple)):
        return list(v)
    return [v] * n


class _SkipScale(nn.Module):
    """One hourglass scale, containing the next scale recursively."""

    depth: int  # scale index
    n_scales: int
    channels_down: Sequence[int]
    channels_up: Sequence[int]
    channels_skip: Sequence[int]
    filter_size_down: Sequence[int]
    filter_size_up: Sequence[int]
    filter_skip_size: int
    pad: str
    act_fun: str
    upsample_mode: Sequence[str]
    downsample_mode: Sequence[str]
    need1x1_up: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        i = self.depth
        act = activation(self.act_fun)
        deepest = i == self.n_scales - 1

        # deeper branch: downsample conv + conv, recurse, upsample
        d = Conv2d(
            self.channels_down[i],
            self.filter_size_down[i],
            stride=2,
            pad=self.pad,
            downsample_mode=self.downsample_mode[i],
        )(x)
        d = act(BatchNorm2d()(d))
        d = Conv2d(self.channels_down[i], self.filter_size_down[i], pad=self.pad)(d)
        d = act(BatchNorm2d()(d))
        if not deepest:
            d = _SkipScale(
                depth=i + 1,
                n_scales=self.n_scales,
                channels_down=self.channels_down,
                channels_up=self.channels_up,
                channels_skip=self.channels_skip,
                filter_size_down=self.filter_size_down,
                filter_size_up=self.filter_size_up,
                filter_skip_size=self.filter_skip_size,
                pad=self.pad,
                act_fun=self.act_fun,
                upsample_mode=self.upsample_mode,
                downsample_mode=self.downsample_mode,
                need1x1_up=self.need1x1_up,
            )(d)
        d = upsample2x(d, self.upsample_mode[i])

        if self.channels_skip[i] > 0:
            s = Conv2d(self.channels_skip[i], self.filter_skip_size, pad=self.pad)(x)
            s = act(BatchNorm2d()(s))
            y = concat_center_crop([s, d])
        else:
            y = d

        y = BatchNorm2d()(y)
        y = Conv2d(self.channels_up[i], self.filter_size_up[i], pad=self.pad)(y)
        y = act(BatchNorm2d()(y))
        if self.need1x1_up:
            y = Conv2d(self.channels_up[i], 1, pad=self.pad)(y)
            y = act(BatchNorm2d()(y))
        return y


class Skip(nn.Module):
    """Encoder-decoder with per-scale skip branches (DIP 'skip' net)."""

    num_output_channels: int = 3
    channels_down: Sequence[int] = (16, 32, 64, 128, 128)
    channels_up: Sequence[int] = (16, 32, 64, 128, 128)
    channels_skip: Sequence[int] = (4, 4, 4, 4, 4)
    filter_size_down: Union[int, Sequence[int]] = 3
    filter_size_up: Union[int, Sequence[int]] = 3
    filter_skip_size: int = 1
    need_sigmoid: bool = True
    pad: str = "zero"
    upsample_mode: Union[str, Sequence[str]] = "nearest"
    downsample_mode: Union[str, Sequence[str]] = "stride"
    act_fun: str = "LeakyReLU"
    need1x1_up: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.channels_down)
        assert len(self.channels_up) == len(self.channels_skip) == n
        y = _SkipScale(
            depth=0,
            n_scales=n,
            channels_down=tuple(self.channels_down),
            channels_up=tuple(self.channels_up),
            channels_skip=tuple(self.channels_skip),
            filter_size_down=tuple(_as_list(self.filter_size_down, n)),
            filter_size_up=tuple(_as_list(self.filter_size_up, n)),
            filter_skip_size=self.filter_skip_size,
            pad=self.pad,
            act_fun=self.act_fun,
            upsample_mode=tuple(_as_list(self.upsample_mode, n)),
            downsample_mode=tuple(_as_list(self.downsample_mode, n)),
            need1x1_up=self.need1x1_up,
        )(x)
        y = Conv2d(self.num_output_channels, 1, pad=self.pad)(y)
        if self.need_sigmoid:
            y = nn.sigmoid(y)
        return y


def dip_skip_128(num_channels: int = 128) -> Skip:
    """The exact configuration the LRS-PnP-DIP main instantiates
    (reference ``main_LRS_PnP_DIP_pro.py:215-221``)."""
    return Skip(
        num_output_channels=num_channels,
        channels_down=(128,) * 5,
        channels_up=(128,) * 5,
        channels_skip=(128,) * 5,
        filter_size_down=3,
        filter_size_up=3,
        filter_skip_size=1,
        need_sigmoid=True,
        pad="reflection",
        upsample_mode="nearest",
        act_fun="LeakyReLU",
    )

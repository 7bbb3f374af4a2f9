"""The 1-Lipschitz-constrained DIP network (LRS-PnP-DIP(1-Lip) variant).

Structure re-derived from reference ``models/my_Lipschitz_Unet.py:21-148``:
a no-skip 4-down/4-up stack, all 128 channels, every conv spectral-norm
constrained and every BN weight/bias max-abs normalised:

  d1..d4:  SNconv3x3 stride2 -> SNBN -> LReLU -> SNconv3x3 -> SNBN -> LReLU
  up1,up2: nearest x2 -> SNconv2x2 -> SNBN -> LReLU
  up3,up4: nearest x2 -> SNconv3x3 -> SNBN -> LReLU
  head:    SNconv1x1 -> SNBN -> LReLU -> SNconv1x1 -> LReLU

The conv2x2 layers run un-padded ((k-1)//2 = 0), so spatial sizes follow
the reference exactly: 36 -> 18 -> 9 -> 5 -> 3 -> 6->5 -> 10->9 -> 18 -> 36.

Size-generic extension: the reference architecture only returns to the
input size for 36-like spatial geometries (its up path hard-codes the
36 -> ... -> 3 -> ... -> 36 ladder, ``my_Lipschitz_Unet.py:21-148``).
Here each up stage mirror-resizes (nearest) to the size recorded at the
corresponding down stage whenever the conv output does not already match.
At the reference 36x36 geometry every recorded size is hit exactly, the
resizes are statically dead, and the compiled graph is the faithful one;
at any other tile size (48, 72, ...) the net closes to the input shape,
so ``dip_1lip`` composes with :func:`..solvers.tiled.solve_tiled` at any
tile size (property-tested in ``tests/test_models.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import activation, upsample2x
from .lipschitz import SNBatchNorm2d, SNConv2d


class LipschitzUNet(nn.Module):
    num_output_channels: int = 128
    width: int = 128
    ln_lambda: float = 1.0
    pad: str = "reflection"
    act_fun: str = "LeakyReLU"
    sn_mode: str = "power"

    def _conv(self, k, stride=1):
        return SNConv2d(
            self.width,
            kernel_size=k,
            stride=stride,
            ln_lambda=self.ln_lambda,
            pad=self.pad,
            sn_mode=self.sn_mode,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = activation(self.act_fun)

        def down_block(y):
            y = act(SNBatchNorm2d()(self._conv(3, 2)(y)))
            y = act(SNBatchNorm2d()(self._conv(3)(y)))
            return y

        def up_block(y, k):
            y = upsample2x(y, "nearest")
            y = act(SNBatchNorm2d()(self._conv(k)(y)))
            return y

        y = x
        down_sizes = []
        for _ in range(4):
            down_sizes.append(y.shape[1:3])
            y = down_block(y)
        for k, target in zip((2, 2, 3, 3), reversed(down_sizes)):
            y = up_block(y, k)
            if y.shape[1:3] != target:
                # statically dead at the reference 36-geometry (the faithful
                # ladder lands on every mirror size exactly); at other tile
                # sizes this closes the net back to the input shape
                y = jax.image.resize(
                    y, (y.shape[0], *target, y.shape[3]), method="nearest"
                )
        y = act(SNBatchNorm2d()(self._conv(1)(y)))
        y = act(
            SNConv2d(
                self.num_output_channels,
                kernel_size=1,
                ln_lambda=self.ln_lambda,
                pad=self.pad,
                sn_mode=self.sn_mode,
            )(y)
        )
        return y

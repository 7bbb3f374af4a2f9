"""Shared NN building blocks for the DIP model zoo (flax.linen, NHWC).

Re-designs the reference's torch building blocks
(``models/common.py:6-121`` — ``Concat``/``act``/``bn``/``conv``) for
TPU/XLA:

  * NHWC layout (TPU-native), static shapes;
  * BatchNorm in *training-mode* semantics only: the reference's DIP nets
    are never switched to eval, so running statistics are dead state — we
    normalise with the current batch statistics each call, which keeps the
    whole net a pure function (no mutable collections inside
    ``lax.while_loop``);
  * reflection / zero padding + VALID conv instead of torch pad modules;
  * nearest / bilinear x2 upsampling via ``jnp.repeat`` / ``jax.image``;
  * center-crop concatenation (the reference ``Concat`` crops every branch
    to the minimum spatial size before concatenating).

Conv weights use the torch-default fan-in uniform init so network behavior
matches the reference's DIP dynamics in scale.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
kaiming_uniform_init = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


def activation(name: str = "LeakyReLU") -> Callable[[jnp.ndarray], jnp.ndarray]:
    """'LeakyReLU' (slope 0.2) | 'Swish' | 'ELU' | 'none'."""
    if name == "LeakyReLU":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    if name == "Swish":
        return lambda x: x * nn.sigmoid(x)
    if name == "ELU":
        return nn.elu
    if name == "none":
        return lambda x: x
    raise ValueError(f"unknown activation {name!r}")


class BatchNorm2d(nn.Module):
    """Training-mode batch normalisation over (N, H, W) per channel."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        return y * scale + bias


class MeanOnlyBatchNorm(nn.Module):
    """Subtract batch mean, add learned bias (reference
    ``models/common_for_Lipschitz_Control.py`` MeanOnlyBatchNorm)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        bias = self.param("bias", nn.initializers.zeros, (c,))
        axes = tuple(range(x.ndim - 1))
        return x - jnp.mean(x, axis=axes) + bias


def pad_input(x: jnp.ndarray, pad: int, mode: str) -> jnp.ndarray:
    """Spatial padding for NHWC (or NDHWC) tensors."""
    if pad == 0:
        return x
    spatial = [(pad, pad)] * (x.ndim - 2)
    widths = [(0, 0)] + spatial + [(0, 0)]
    if mode == "reflection":
        return jnp.pad(x, widths, mode="reflect")
    if mode == "replication":
        return jnp.pad(x, widths, mode="edge")
    if mode == "zero":
        return jnp.pad(x, widths)
    raise ValueError(f"unknown pad mode {mode!r}")


class Conv2d(nn.Module):
    """Conv with the reference's pad/downsample conventions.

    ``pad`` in {'zero', 'reflection'}: torch-style symmetric padding of
    ``(k-1)//2`` then VALID convolution — identical arithmetic to the
    reference's pad-module + Conv2d pipeline (``models/common.py:96-121``).
    ``downsample_mode`` 'stride' uses strided conv; 'avg'/'max' convolve at
    stride 1 then pool; 'lanczos2'/'lanczos3' append an anti-aliased
    :class:`~lrs_pnp_dip_tpu.models.downsampler.Downsampler`.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    pad: str = "zero"
    downsample_mode: str = "stride"
    kernel_init: Callable = torch_conv_init

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        stride = self.stride
        pool = None
        if stride != 1 and self.downsample_mode != "stride":
            pool = self.downsample_mode
            stride = 1
        k = self.kernel_size
        x = pad_input(x, (k - 1) // 2, self.pad)
        x = nn.Conv(
            self.features,
            (k, k),
            strides=(stride, stride),
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
        )(x)
        if pool in ("avg", "max"):
            fn = nn.avg_pool if pool == "avg" else nn.max_pool
            s = self.stride
            x = fn(x, (s, s), strides=(s, s))
        elif pool in ("lanczos2", "lanczos3"):
            from .downsampler import Downsampler

            x = Downsampler(
                factor=self.stride, kernel_type=pool, phase=0.5, preserve_size=True
            )(x)
        elif pool is not None:
            raise ValueError(f"unknown downsample mode {pool!r}")
        return x


def upsample2x(x: jnp.ndarray, mode: str = "nearest") -> jnp.ndarray:
    """x2 spatial upsampling of NHWC."""
    if mode == "nearest":
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    if mode == "bilinear":
        n, h, w, c = x.shape
        return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")
    raise ValueError(f"unknown upsample mode {mode!r}")


def concat_center_crop(inputs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Concatenate on channels after center-cropping to the min spatial size
    (reference ``Concat``, ``models/common.py:19-39``)."""
    th = min(t.shape[1] for t in inputs)
    tw = min(t.shape[2] for t in inputs)
    cropped = []
    for t in inputs:
        dh = (t.shape[1] - th) // 2
        dw = (t.shape[2] - tw) // 2
        cropped.append(t[:, dh : dh + th, dw : dw + tw, :])
    return jnp.concatenate(cropped, axis=-1)


class GenNoise(nn.Module):
    """Emit a standard-normal noise tensor shaped like the input but with
    ``dim2`` channels (reference ``models/common.py:45-60``)."""

    dim2: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        rng = self.make_rng("noise")
        shape = x.shape[:-1] + (self.dim2,)
        return jax.random.normal(rng, shape, x.dtype)

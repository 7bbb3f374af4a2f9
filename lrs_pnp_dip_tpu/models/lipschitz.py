"""Lipschitz-constrained layers (spectral normalisation).

Reference semantics (``models/lipschitz_constraint_layer.py:24-159``):

  * ``SpectralNorm``-wrapped conv: each forward computes the LARGEST
    singular value sigma of the weight reshaped to (out, -1) — via exact
    SVD in the reference (``:41``) — detached from the graph (torch
    ``.data``), then uses ``w / max(1, sigma / ln_lambda)``.  This softly
    constrains the layer's Lipschitz constant to <= ln_lambda.
  * ``BatchNormSpectralNorm``: during training, BN weight AND bias are
    both divided by ``max(sigma_target, max|weight|)``
    (``compute_weight``, ``:88-101``).

TPU-first: exact SVD of a (C_out, C_in*k*k) matrix per conv per step maps
poorly to the MXU, so the default estimator is *power iteration* with a
persistent ``u`` vector (a handful of matvecs on the MXU; the standard SN
trick).  ``sn_mode='exact'`` keeps full-SVD parity for tests — the two are
tolerance-tested against each other in ``tests/test_models.py``.  The
sigma estimate is ``stop_gradient``-ed, matching the reference's use of
``.data``.

A true function-space conv spectral norm (power iteration with conv /
conv-transpose applications, reference ``models/conv_sn_chen.py:16-167``)
is provided as :class:`ConvOperatorNorm` for the M4 component.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import BatchNorm2d, kaiming_uniform_init, pad_input


def _sigma_max_exact(w2d: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(w2d, ord=2)


def _sigma_max_power(w2d: jnp.ndarray, u: jnp.ndarray, n_iter: int):
    """Power iteration on W W^T; returns (sigma, new_u)."""

    def body(u, _):
        v = w2d.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = w2d @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
        return u, None

    u, _ = jax.lax.scan(body, u, None, length=n_iter)
    v = w2d.T @ u
    sigma = jnp.linalg.norm(v)
    return sigma, u


class SNConv2d(nn.Module):
    """Conv2d whose weight is divided by ``max(1, sigma/ln_lambda)``.

    ``ln_lambda <= 0`` disables the constraint (reference ``conv`` factory,
    ``lipschitz_constraint_layer.py:65-78``; Kaiming-uniform init as there).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    ln_lambda: float = 1.0
    use_bias: bool = True
    pad: str = "zero"
    sn_mode: str = "power"  # 'power' | 'exact'
    power_iters: int = 8
    kernel_init: Callable = kaiming_uniform_init

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (k, k, cin, self.features))
        if self.ln_lambda > 0:
            # torch reshapes (out, in*k*k); singular values are layout-
            # invariant under row/col permutation, so flatten HWIO -> (O, ...).
            w2d = kernel.transpose(3, 0, 1, 2).reshape(self.features, -1)
            if self.sn_mode == "exact":
                sigma = _sigma_max_exact(w2d)
            else:
                u = self.variable(
                    "sn_state",
                    "u",
                    lambda: jax.random.normal(
                        self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0),
                        (self.features,),
                    ),
                )
                sigma, new_u = _sigma_max_power(w2d, u.value, self.power_iters)
                if not self.is_initializing():
                    u.value = new_u
            sigma = jax.lax.stop_gradient(sigma)
            kernel = kernel / jnp.maximum(1.0, sigma / self.ln_lambda)
        x = pad_input(x, (k - 1) // 2, self.pad)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride, self.stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class SNBatchNorm2d(nn.Module):
    """BatchNorm with the reference's BN spectral normalisation: scale and
    bias divided by ``max(sigma, max|scale|)`` (training mode)."""

    sigma: float = 1.0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        cur = jnp.maximum(jax.lax.stop_gradient(jnp.max(jnp.abs(scale))), self.sigma)
        scale = scale / cur
        bias = bias / cur
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        return (x - mean) / jnp.sqrt(var + self.eps) * scale + bias


class ConvOperatorNorm(nn.Module):
    """Conv with function-space spectral normalisation: the conv operator's
    sigma_max estimated by power iteration alternating conv and
    conv-transpose applications on a persistent ``u`` feature map, then the
    weight rescaled toward a target norm (reference ``conv_sn_chen.py``,
    generalised to any spatial size instead of its hard-coded 40x40)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    target_norm: float = 1.0
    use_bias: bool = True
    pad: str = "zero"
    power_iters: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", kaiming_uniform_init, (k, k, cin, self.features))
        h, w = x.shape[1], x.shape[2]
        pad_amt = (k - 1) // 2

        def conv_op(v):  # (1,H,W,cin) -> (1,H,W,cout)
            return jax.lax.conv_general_dilated(
                v, kernel, (1, 1), [(pad_amt, pad_amt)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def convT_op(u):  # adjoint
            return jax.lax.conv_general_dilated(
                u, kernel.transpose(0, 1, 3, 2)[::-1, ::-1], (1, 1),
                [(pad_amt, pad_amt)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        u_var = self.variable(
            "sn_state", "u", lambda: jnp.ones((1, h, w, self.features)) / jnp.sqrt(h * w * self.features)
        )
        u = u_var.value
        for _ in range(self.power_iters):
            v = convT_op(u)
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u = conv_op(v)
            u = u / (jnp.linalg.norm(u) + 1e-12)
        sigma = jnp.sum(u * conv_op(v))
        if not self.is_initializing():
            u_var.value = u
        sigma = jax.lax.stop_gradient(jnp.maximum(sigma, 1e-12))
        kernel_n = kernel / sigma * self.target_norm
        y = jax.lax.conv_general_dilated(
            pad_input(x, pad_amt, self.pad),
            kernel_n,
            (self.stride, self.stride),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y

"""General proximal-operator / measurement-operator library.

Re-designs reference ``admm_utils.py:13-142`` (a standalone PnP toolkit the
mains never import, but part of the reference's capability surface):

  * measurement operators: random-subsampling inpainting and strided-grid
    super-resolution, each as (A, At, mask/diag) triples;
  * proxes: l1 (soft threshold), isotropic TV (Chambolle dual projection),
    NLM plug-in denoiser, l-inf prox via Moreau decomposition;
  * projections: l-inf ball, simplex (sorted cumulative threshold),
    l1 ball (via simplex of |x|).

All pure jnp, static-shaped, jit/vmap-ready.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .nlm import nlm2d
from .shrinkage import soft_threshold


class MeasurementOp(NamedTuple):
    """Linear measurement operator with adjoint and diagonal."""

    A: Callable[[jnp.ndarray], jnp.ndarray]
    At: Callable[[jnp.ndarray], jnp.ndarray]
    diag: jnp.ndarray  # diag(A^T A) as an image-shaped mask


def inpainting_operator(key, shape: Tuple[int, ...], keep_ratio: float) -> MeasurementOp:
    """Random-pixel-subsampling operator (reference ``A_inpainting``)."""
    mask = (jax.random.uniform(key, shape) < keep_ratio).astype(jnp.float32)
    return MeasurementOp(A=lambda x: mask * x, At=lambda y: mask * y, diag=mask)


def superresolution_operator(shape: Tuple[int, int], factor: int) -> MeasurementOp:
    """Strided-grid subsampling (reference ``A_superresolution``): keep
    every ``factor``-th pixel on both axes."""
    h, w = shape
    rows = (jnp.arange(h) % factor == 0)[:, None]
    cols = (jnp.arange(w) % factor == 0)[None, :]
    mask = (rows & cols).astype(jnp.float32)
    return MeasurementOp(A=lambda x: mask * x, At=lambda y: mask * y, diag=mask)


def l1_prox(x: jnp.ndarray, tau) -> jnp.ndarray:
    return soft_threshold(x, tau)


@functools.partial(jax.jit, static_argnames=("n_iter",))
def tv_prox(x: jnp.ndarray, lam, n_iter: int = 50) -> jnp.ndarray:
    """Isotropic total-variation prox of a 2-D image (Chambolle 2004 dual
    projection — replaces the reference's ``prox_tv`` pip dependency)."""
    tau = 0.25

    def grad(u):
        gx = jnp.diff(u, axis=0, append=u[-1:, :])
        gy = jnp.diff(u, axis=1, append=u[:, -1:])
        return gx, gy

    def div(px, py):
        dx = jnp.concatenate([px[:1], px[1:-1] - px[:-2], -px[-2:-1]], axis=0)
        dy = jnp.concatenate([py[:, :1], py[:, 1:-1] - py[:, :-2], -py[:, -2:-1]], axis=1)
        return dx + dy

    def body(carry, _):
        px, py = carry
        gx, gy = grad(div(px, py) - x / lam)
        denom = 1.0 + tau * jnp.sqrt(gx * gx + gy * gy)
        return ((px + tau * gx) / denom, (py + tau * gy) / denom), None

    p0 = (jnp.zeros_like(x), jnp.zeros_like(x))
    (px, py), _ = jax.lax.scan(body, p0, None, length=n_iter)
    return x - lam * div(px, py)


def nlm_prox(x: jnp.ndarray, h, patch_size: int = 3, patch_distance: int = 3):
    """Plug-and-play NLM denoiser as a prox (reference ``nlm_prox``)."""
    return nlm2d(x, h, patch_size, patch_distance)


def bm3d_prox(x: jnp.ndarray, sigma, cfg=None):
    """Plug-and-play BM3D denoiser as a prox (reference ``bm3d_prox``,
    ``admm_utils.py:60-75`` — there a wrapper over the pip ``bm3d`` C
    library; here the JAX implementation in :mod:`.bm3d`)."""
    from .bm3d import Bm3dConfig, bm3d_prox as _impl

    return _impl(x, sigma, cfg if cfg is not None else Bm3dConfig())


def linf_project(x: jnp.ndarray, radius) -> jnp.ndarray:
    """Projection onto the l-inf ball (reference ``linf_proj``)."""
    return jnp.clip(x, -radius, radius)


def simplex_project(x: jnp.ndarray, radius=1.0) -> jnp.ndarray:
    """Euclidean projection of a vector onto the probability simplex of
    size ``radius`` (sorted cumulative-threshold algorithm)."""
    v = x.reshape(-1)
    n = v.shape[0]
    u = jnp.sort(v)[::-1]
    css = jnp.cumsum(u) - radius
    idx = jnp.arange(1, n + 1, dtype=v.dtype)
    cond = u - css / idx > 0
    rho = jnp.max(jnp.where(cond, jnp.arange(n), -1))
    theta = css[rho] / (rho + 1.0)
    return jnp.maximum(v - theta, 0.0).reshape(x.shape)


def l1_project(x: jnp.ndarray, radius=1.0) -> jnp.ndarray:
    """Projection onto the l1 ball via simplex projection of |x|."""
    inside = jnp.sum(jnp.abs(x)) <= radius
    proj = jnp.sign(x) * simplex_project(jnp.abs(x), radius)
    return jnp.where(inside, x, proj)


def linf_prox(x: jnp.ndarray, tau) -> jnp.ndarray:
    """Prox of tau*||.||_inf via Moreau: x - tau * proj_l1ball(x / tau)."""
    return x - tau * l1_project(x / tau, 1.0)

"""BM3D denoiser — block-matching + collaborative 3-D filtering, in JAX.

Completes the reference's denoiser family (S7/S10): ``admm_utils.py:60-75``
wraps the pip ``bm3d`` C library as ``bm3d_prox``, and the MATLAB twin
existence-checks the Tampere BM3D MEX distribution (``pnp_ista.m:18-22``)
even though its live call path is NLM.  This is a TPU-first re-design,
not a port of either: everything is static-shaped, batched, and built
from MXU-friendly primitives —

  * patches on a fixed stride grid (gathers with trace-time index maps);
  * block matching as ONE all-pairs distance matrix (a Gram matmul)
    masked to the search radius, ``top_k`` for group selection — no
    data-dependent control flow;
  * the collaborative 3-D transform as three small dense matmuls
    (orthonormal DCT-II along rows, cols, and the similarity axis);
  * hard-threshold (stage 1) / empirical Wiener (stage 2) shrinkage;
  * aggregation by ``segment_sum`` over group membership, then one
    scatter-add back onto the pixel grid.

Global (radius-masked) matching over the full patch grid is exact at the
framework's native scene sizes (36x36 .. a few hundred px); for tiled
large cubes each tile runs its own matcher (see ``solvers/tiled.py``).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Bm3dConfig:
    """Static BM3D parameters (defaults follow the classic hard-threshold
    profile of the Tampere implementation the reference bundles)."""

    patch: int = 8
    stride: int = 3  # the Tampere profiles' Nstep (stage 2 relies on the
    # denser cover: at stride 4 the Wiener stage can regress below HT)
    group: int = 16  # patches per collaborative group
    search: int = 16  # Chebyshev matching radius (pixels)
    lambda3d: float = 2.7  # hard-threshold multiplier (stage 1)
    wiener: bool = True  # run the stage-2 Wiener refinement
    # Match-distance cutoffs (mean squared difference per pixel, [0,1] data):
    # group members farther than this from the reference patch are replaced
    # by the reference itself.  Values are the Tampere profile's
    # tau_match = 3000 / 255^2 and tau_match_wiener = 400 / 255^2 — without
    # the stage-2 cutoff the Wiener groups mix dissimilar patches (distances
    # shrink on the smoothed basic estimate) and stage 2 can REGRESS.
    tau_match: float = 3000.0 / 65025.0
    tau_match_wiener: float = 400.0 / 65025.0


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n, n)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    C = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    C[0] *= 1.0 / np.sqrt(2.0)
    return (C * np.sqrt(2.0 / n)).astype(np.float32)


def _grid(size: int, patch: int, stride: int) -> np.ndarray:
    """Patch start positions covering [0, size-patch], appending the last
    position when the stride doesn't land on it (the same cover-the-edge
    rule as the solver's im2col, ``ops/blocks.py``)."""
    pos = list(range(0, size - patch + 1, stride))
    if pos[-1] != size - patch:
        pos.append(size - patch)
    return np.asarray(pos, np.int32)


def _extract(img: jnp.ndarray, ys: np.ndarray, xs: np.ndarray, p: int):
    """All (len(ys)*len(xs), p, p) patches via one vectorized gather."""
    py, px = np.meshgrid(ys, xs, indexing="ij")
    py = py.reshape(-1)
    px = px.reshape(-1)
    ry = py[:, None] + np.arange(p)  # (nP, p)
    rx = px[:, None] + np.arange(p)
    return img[ry[:, :, None], rx[:, None, :]], py, px


def _match(patches: jnp.ndarray, py, px, cfg: Bm3dConfig, tau: float) -> jnp.ndarray:
    """Group indices (nP, g): the g nearest patches within the search
    radius (self always included; distances via one Gram matmul).  Members
    whose mean-squared patch distance exceeds ``tau`` are replaced by the
    reference patch itself (static shapes; degenerate groups just average
    the reference with itself, as in the Tampere matcher's N2 shrink)."""
    nP = patches.shape[0]
    p2 = patches.shape[1] * patches.shape[2]
    flat = patches.reshape(nP, -1)
    sq = jnp.sum(flat * flat, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (flat @ flat.T)
    cheb = np.maximum(
        np.abs(py[:, None] - py[None, :]), np.abs(px[:, None] - px[None, :])
    )
    d2 = jnp.where(jnp.asarray(cheb <= cfg.search), d2, jnp.inf)
    g = min(cfg.group, nP)
    negd, idx = jax.lax.top_k(-d2, g)
    self_idx = jnp.arange(nP, dtype=idx.dtype)[:, None]
    return jnp.where(-negd <= tau * p2, idx, self_idx)  # (nP, g)


def _aggregate(filtered, weights, idx, py, px, p, nP, shape):
    """Weighted aggregation: group members -> per-patch sums via
    segment_sum, then one scatter-add onto the pixel grid."""
    g = idx.shape[1]
    seg = idx.reshape(-1)
    vals = (filtered * weights[:, None, None, None]).reshape(nP * g, p, p)
    wrep = jnp.broadcast_to(weights[:, None], (nP, g)).reshape(-1)
    patch_num = jax.ops.segment_sum(vals, seg, num_segments=nP)
    patch_den = jax.ops.segment_sum(wrep, seg, num_segments=nP)
    ry = py[:, None] + np.arange(p)
    rx = px[:, None] + np.arange(p)
    num = jnp.zeros(shape, jnp.float32).at[ry[:, :, None], rx[:, None, :]].add(
        patch_num
    )
    den = jnp.zeros(shape, jnp.float32).at[ry[:, :, None], rx[:, None, :]].add(
        patch_den[:, None, None] * jnp.ones((p, p), jnp.float32)
    )
    return num, den


@functools.partial(jax.jit, static_argnums=(2,))
def _bm3d_impl(img: jnp.ndarray, sigma: jnp.ndarray, cfg: Bm3dConfig):
    H, W = img.shape
    p = min(cfg.patch, H, W)
    ys = _grid(H, p, cfg.stride)
    xs = _grid(W, p, cfg.stride)
    C = jnp.asarray(_dct_matrix(p))

    def dct2(x):  # (..., p, p)
        return jnp.einsum("ij,...jk,lk->...il", C, x, C)

    def idct2(x):
        return jnp.einsum("ji,...jk,kl->...il", C, x, C)

    patches, py, px = _extract(img, ys, xs, p)
    nP = patches.shape[0]
    idx = _match(patches, py, px, cfg, cfg.tau_match)
    g = idx.shape[1]
    Tg = jnp.asarray(_dct_matrix(g))
    coef2d = dct2(patches)  # (nP, p, p), shared across groups

    def transform3d(groups):  # (nP, g, p, p) of 2-D coefficients
        return jnp.einsum("gh,nhpq->ngpq", Tg, groups)

    def inverse3d(groups):
        return idct2(jnp.einsum("hg,ngpq->nhpq", Tg, groups))

    # ---- stage 1: collaborative hard threshold -----------------------
    grp = coef2d[idx]  # (nP, g, p, p)
    c3 = transform3d(grp)
    keep = jnp.abs(c3) >= cfg.lambda3d * sigma
    c3h = jnp.where(keep, c3, 0.0)
    nret = jnp.sum(keep.reshape(nP, -1), axis=1).astype(jnp.float32)
    w_ht = 1.0 / jnp.maximum(nret, 1.0)
    filt = inverse3d(c3h)
    num, den = _aggregate(filt, w_ht, idx, py, px, p, nP, (H, W))
    basic = jnp.where(den > 0, num / jnp.maximum(den, 1e-12), img)
    if not cfg.wiener:
        return basic

    # ---- stage 2: empirical Wiener using the basic estimate ----------
    bpatches, _, _ = _extract(basic, ys, xs, p)
    idx2 = _match(bpatches, py, px, cfg, cfg.tau_match_wiener)
    b3 = transform3d(dct2(bpatches)[idx2])
    n3 = transform3d(coef2d[idx2])
    Wsh = (b3 * b3) / (b3 * b3 + sigma * sigma + 1e-20)
    w_wie = 1.0 / (sigma * sigma * jnp.sum(Wsh.reshape(nP, -1) ** 2, axis=1) + 1e-12)
    filt2 = inverse3d(Wsh * n3)
    num2, den2 = _aggregate(filt2, w_wie, idx2, py, px, p, nP, (H, W))
    return jnp.where(den2 > 0, num2 / jnp.maximum(den2, 1e-12), basic)


def bm3d(img: jnp.ndarray, sigma, cfg: Bm3dConfig = Bm3dConfig()) -> jnp.ndarray:
    """Denoise a 2-D image (H, W); ``sigma`` is the noise std."""
    return _bm3d_impl(
        jnp.asarray(img, jnp.float32), jnp.asarray(sigma, jnp.float32), cfg
    )


def bm3d_prox(x: jnp.ndarray, sigma, cfg: Bm3dConfig = Bm3dConfig()) -> jnp.ndarray:
    """PnP prox interface mirroring reference ``admm_utils.py:60-75``
    (``bm3d_prox``: denoise each channel of the iterate at strength
    ``sigma``).  Accepts (H, W) or (H, W, B); bands are vmapped."""
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 2:
        return bm3d(x, sigma, cfg)
    if x.ndim == 3:
        return jax.vmap(lambda b: bm3d(b, sigma, cfg), in_axes=2, out_axes=2)(x)
    raise ValueError(f"bm3d_prox expects (H, W) or (H, W, B), got {x.shape}")


def bm3d_coef_batch(G: jnp.ndarray, h: jnp.ndarray, cfg: Bm3dConfig) -> jnp.ndarray:
    """BM3D as the PnP-ISTA coefficient denoiser (the role NLM plays at
    ``main_LRS_PnP_DIP_pro.py:199``): each block's (K,) coefficient vector
    is folded to a 2-D (K/w, w) image, denoised, and unfolded.  ``h`` is
    the per-block strength (same scale as the NLM h).  G: (nB, K)."""
    nB, K = G.shape
    w = 1
    for cand in range(int(np.sqrt(K)), 0, -1):
        if K % cand == 0:
            w = cand
            break
    imgs = G.reshape(nB, K // w, w)
    return jax.vmap(lambda im, hh: bm3d(im, hh, cfg))(imgs, h).reshape(nB, K)

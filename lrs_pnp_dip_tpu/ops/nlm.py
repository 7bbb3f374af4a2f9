"""Non-local-means denoiser — the plug-and-play denoiser inside ISTA.

Reference behavior: inside every ISTA iteration the gradient vector
(shape (K, 1), K = number of dictionary atoms) is denoised with
``skimage.restoration.denoise_nl_means(patch_size=3, patch_distance=3,
h=T, fast_mode=True)`` (reference ``main_LRS_PnP_DIP_pro.py:195-200``,
``main_LRS_PnP.py:143-147``; MATLAB twin ``NLmeansfilter.m``).  Note the
reference quirk: the denoiser runs on the *coefficient vector* treated as a
2-D image, not on image pixels.

This module implements the *fast-mode pairwise NLM* algorithm family used by
skimage (and documented in Darbon et al., "Fast nonlocal filtering applied
to electron cryomicroscopy", ISBI 2008):

  * the image is reflect-padded by ``offset + d + 1``;
  * for every half-space shift t = (t_row, t_col), t_col in [0, d],
    t_row in [-d, d], the patchwise squared distance
    ``dist(p, t) = sum_{|u|<=offset} (I[p+u] - I[p+t+u])^2`` is computed
    for all pixels at once (integral-image equivalent: here a box filter
    over the shifted squared difference);
  * pair weight ``w = alpha * exp(-dist / (h^2 s^2))`` with the
    double-count correction ``alpha = 0.5`` on the t_col = 0 axis
    (t != 0), and each pair (p, p+t) contributes symmetrically to both
    endpoints — including the self pair t = 0;
  * output = weighted average, cropped back.

Everything is static-shaped: the shift loop is a compile-time unrolled
7 x 4 = 28-step elementwise pipeline of rolls/multiplies that XLA fuses
into a handful of VPU loops, and is ``vmap``-able over a leading batch of
blocks.  (scikit-image is not a dependency of this framework; the
pairwise-NLM spec above *is* the contract, and ``tests/test_nlm.py`` pins
it against an independent direct-summation oracle.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _box_sum(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Sum over the centered (2r+1)^2 window; out-of-range reads are the
    rolled-around values but callers only consume positions whose windows
    are fully interior (guaranteed by the padding margin)."""
    out = jnp.zeros_like(x)
    for u in range(-radius, radius + 1):
        rolled_u = jnp.roll(x, -u, axis=0)
        for v in range(-radius, radius + 1):
            out = out + jnp.roll(rolled_u, -v, axis=1)
    return out


@functools.partial(jax.jit, static_argnames=("patch_size", "patch_distance"))
def nlm2d(
    image: jnp.ndarray,
    h,
    patch_size: int = 3,
    patch_distance: int = 3,
) -> jnp.ndarray:
    """Fast-mode pairwise NLM of a 2-D image. ``h`` may be a traced scalar."""
    s = patch_size
    d = patch_distance
    offset = s // 2
    pad = offset + d + 1
    n_row, n_col = image.shape

    P = jnp.pad(image.astype(jnp.float32), pad, mode="reflect")
    pr, pc = P.shape
    h2s2 = jnp.maximum(jnp.asarray(h, jnp.float32) ** 2 * (s * s), 1e-30)

    rows = jnp.arange(pr)[:, None]
    cols = jnp.arange(pc)[None, :]

    result = jnp.zeros_like(P)
    weights = jnp.zeros_like(P)

    for t_row in range(-d, d + 1):
        for t_col in range(0, d + 1):
            alpha = 0.5 if (t_col == 0 and t_row != 0) else 1.0
            shifted = jnp.roll(P, (-t_row, -t_col), (0, 1))
            sqdiff = (P - shifted) ** 2
            dist = _box_sum(sqdiff, offset)
            w = alpha * jnp.exp(-jnp.maximum(dist, 0.0) / h2s2)
            # Valid positions for the "left" endpoint of the pair: both the
            # patch window and the shifted partner's window stay inside the
            # padded array.
            row_lo = max(offset, offset - t_row)
            row_hi = pr - max(offset, offset + t_row)
            valid = (
                (rows >= row_lo)
                & (rows < row_hi)
                & (cols >= offset)
                & (cols < pc - offset - t_col)
            )
            w = jnp.where(valid, w, 0.0)
            # pair (p, p+t): p accumulates w * I[p+t]; p+t accumulates w * I[p]
            result = result + w * shifted
            weights = weights + w
            back_w = jnp.roll(w, (t_row, t_col), (0, 1))
            result = result + back_w * jnp.roll(P, (t_row, t_col), (0, 1))
            weights = weights + back_w

    out = result / jnp.maximum(weights, 1e-30)
    return out[pad : pad + n_row, pad : pad + n_col]


def nlm_column(
    vec: jnp.ndarray,
    h,
    patch_size: int = 3,
    patch_distance: int = 3,
) -> jnp.ndarray:
    """NLM of a length-K vector treated as a (K, 1) image (the reference's
    coefficient-vector denoising).  Returns a length-K vector."""
    return nlm2d(vec[:, None], h, patch_size, patch_distance)[:, 0]


# Batched over a leading block axis; h per block.
nlm_column_batch = jax.vmap(nlm_column, in_axes=(0, 0))


def _ring_kernel(f: int):
    """The MATLAB twin's patch kernel (``NLmeansfilter.m make_kernel``):
    nested box rings, value 1/(2d+1)^2 per ring d=1..f, divided by f, then
    normalised to sum 1."""
    import numpy as np

    k = np.zeros((2 * f + 1, 2 * f + 1))
    for d in range(1, f + 1):
        k[f - d : f + d + 1, f - d : f + d + 1] += 1.0 / (2 * d + 1) ** 2
    k /= f
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("search_radius", "patch_radius"))
def nlm_classic(
    image: jnp.ndarray,
    h,
    search_radius: int = 3,
    patch_radius: int = 3,
) -> jnp.ndarray:
    """Classic Buades NLM with the MATLAB twin's exact semantics
    (reference ``LRS-PnP(Matlab Code)/NLmeansfilter.m:32-78``):

      * symmetric (mirror-with-edge) padding of width ``patch_radius``;
      * ring-weighted patch distance (``make_kernel``), w = exp(-d/h^2);
      * search window clamped to *image* bounds (neighbour centers never
        come from padding);
      * the self pixel is excluded from the loop and re-added with the
        MAXIMUM neighbour weight (the ``wmax`` rule);
      * all-zero weight sum falls back to the input pixel.

    This is the denoiser inside the MATLAB ``pnp_ista.m`` (called with
    t=3, f=3, h=T*0.1).
    """
    t, f = search_radius, patch_radius
    m, n = image.shape
    x = image.astype(jnp.float32)
    P = jnp.pad(x, f, mode="symmetric")
    kernel = jnp.asarray(_ring_kernel(f))[:, :, None, None]
    h2 = jnp.maximum(jnp.asarray(h, jnp.float32) ** 2, 1e-30)

    rows = jnp.arange(m)[:, None]
    cols = jnp.arange(n)[None, :]

    def patch_dist(dr, ds):
        shifted = jnp.roll(P, (-dr, -ds), (0, 1))
        sq = ((P - shifted) ** 2)[None, :, :, None]
        d = jax.lax.conv_general_dilated(
            sq, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, :, :, 0]  # (m, n), centered at each original pixel
        return d

    num = jnp.zeros((m, n), jnp.float32)
    den = jnp.zeros((m, n), jnp.float32)
    wmax = jnp.zeros((m, n), jnp.float32)
    for dr in range(-t, t + 1):
        for ds in range(-t, t + 1):
            if dr == 0 and ds == 0:
                continue
            valid = (
                (rows + dr >= 0) & (rows + dr < m) & (cols + ds >= 0) & (cols + ds < n)
            )
            d = patch_dist(dr, ds)
            w = jnp.where(valid, jnp.exp(-d / h2), 0.0)
            neighbor = jnp.roll(P, (-dr, -ds), (0, 1))[f : f + m, f : f + n]
            num = num + w * neighbor
            den = den + w
            wmax = jnp.maximum(wmax, w)
    num = num + wmax * x
    den = den + wmax
    return jnp.where(den > 0, num / den, x)


def nlm_column_batch_fast(G: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Closed-form specialisation of :func:`nlm_column` for a batch of
    (K,)-vectors — the solver's hot path (144 blocks x 100 ISTA iterations).

    For a (K, 1) image every padded column is identical (reflect-padding a
    width-1 axis replicates it), so the 2-D pair loop collapses exactly to
    a 1-D filter.  Carrying the loop's alpha factors and the symmetric
    pair updates through the collapse gives, for interior rows (the output
    region always is, since pad margin 5 > d + offset = 4):

      * self weight: t=(0,0) contributes 2 (pair counted from both ends),
        t_col in {1,2,3} with t_row=0 contribute 2 each  ->  8;
      * neighbour offset delta in {1,2,3}: t_col=0 gives 2 x alpha(0.5) = 1,
        each t_col in {1,2,3} gives 2  ->  7 * w_delta, with
        w_delta(r) = exp(-3 * sum_{u in -1..1}(p[r+u]-p[r+delta+u])^2
                         / (9 h^2))
        (the 3x3 patch distance triples the 1-D window sum; h2s2 = 9 h^2).

    ``tests/test_nlm.py`` pins this against the general 2-D kernel.

    G: (nB, K); h: (nB,) per-block bandwidth.  Returns (nB, K).
    """
    nb, K = G.shape
    pad = 5
    P = jnp.pad(G.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    h2s2 = jnp.maximum((jnp.asarray(h, jnp.float32) ** 2) * 9.0, 1e-30)[:, None]

    num = 8.0 * P
    den = jnp.full_like(P, 8.0)
    L = P.shape[1]
    for delta in (1, 2, 3):
        # sq[:, r] = (P[r] - P[r+delta])^2, r in [0, L-delta)
        sq = (P[:, : L - delta] - P[:, delta:]) ** 2
        # dist[:, r] = 3 * (sq[r-1] + sq[r] + sq[r+1]), r in [1, L-delta-1)
        dist = 3.0 * (sq[:, :-2] + sq[:, 1:-1] + sq[:, 2:])
        w = 7.0 * jnp.exp(-dist / h2s2)  # w[:, j] is weight at row j+1
        # forward: out[r] += w_delta(r) * P[r+delta], r in [1, L-delta-1)
        num = num.at[:, 1 : L - delta - 1].add(w * P[:, 1 + delta : L - 1])
        den = den.at[:, 1 : L - delta - 1].add(w)
        # backward: out[r+delta] += w_delta(r) * P[r]
        num = num.at[:, 1 + delta : L - 1].add(w * P[:, 1 : L - delta - 1])
        den = den.at[:, 1 + delta : L - 1].add(w)
    out = num / den
    return out[:, pad : pad + K]

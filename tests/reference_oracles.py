"""Independent NumPy oracles for the reference numerics.

These are *clean-room re-derivations* of the behaviors documented in
SURVEY.md (with file:line citations), written in plain NumPy so that the
JAX/TPU implementations can be pinned against them.  They intentionally
mirror the reference's quirks (append-last-row/col block rule, Fortran
block flattening, row pruning, pairwise fast-NLM, 255-PSNR).
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------- blocks ---
def oracle_block_starts(extent: int, bb: int, stride: int):
    starts = list(range(0, extent - bb + 1, stride))
    if extent % bb != 0 and starts[-1] != extent - bb:
        starts.append(extent - bb)
    return starts


def oracle_get_image_blocks(img: np.ndarray, bb: int, stride: int):
    """Blocks as (bb*bb, nB) columns, Fortran-flattened, reference ordering
    (start grid scanned column-major: band-start is the slow axis)."""
    xs = oracle_block_starts(img.shape[0], bb, stride)
    ys = oracle_block_starts(img.shape[1], bb, stride)
    cols = []
    rows_out, cols_out = [], []
    for y in ys:
        for x in xs:
            blk = img[x : x + bb, y : y + bb]
            cols.append(blk.flatten(order="F"))
            rows_out.append(x)
            cols_out.append(y)
    return np.stack(cols, axis=1), np.array(rows_out), np.array(cols_out)


def oracle_scatter(blocks: np.ndarray, rows, cols, bb: int, shape):
    """Sum-scatter of (bb*bb, nB) Fortran-flattened blocks; returns
    (IMout, Weight)."""
    im = np.zeros(shape, dtype=np.float64)
    wt = np.zeros(shape, dtype=np.float64)
    for i in range(blocks.shape[1]):
        r, c = rows[i], cols[i]
        blk = blocks[:, i].reshape(bb, bb).T  # undo F-flatten
        im[r : r + bb, c : c + bb] += blk
        wt[r : r + bb, c : c + bb] += 1.0
    return im, wt


# ------------------------------------------------------------------- nlm ---
def oracle_nlm2d(image: np.ndarray, h: float, s: int = 3, d: int = 3):
    """Direct (non-vectorised) pairwise fast-NLM with the exact loop
    structure described in lrs_pnp_dip_tpu/ops/nlm.py's docstring."""
    offset = s // 2
    pad = offset + d + 1
    P = np.pad(image.astype(np.float64), pad, mode="reflect")
    n_row, n_col = P.shape
    h2s2 = max(h * h * s * s, 1e-30)
    result = np.zeros_like(P)
    weights = np.zeros_like(P)
    for t_row in range(-d, d + 1):
        for t_col in range(0, d + 1):
            alpha = 0.5 if (t_col == 0 and t_row != 0) else 1.0
            for row in range(max(offset, offset - t_row), n_row - max(offset, offset + t_row)):
                for col in range(offset, n_col - offset - t_col):
                    dist = 0.0
                    for u in range(-offset, offset + 1):
                        for v in range(-offset, offset + 1):
                            diff = P[row + u, col + v] - P[row + t_row + u, col + t_col + v]
                            dist += diff * diff
                    w = alpha * np.exp(-max(dist, 0.0) / h2s2)
                    result[row, col] += w * P[row + t_row, col + t_col]
                    weights[row, col] += w
                    result[row + t_row, col + t_col] += w * P[row, col]
                    weights[row + t_row, col + t_col] += w
    out = result / np.maximum(weights, 1e-30)
    h0, w0 = image.shape
    return out[pad : pad + h0, pad : pad + w0]


def oracle_nlm_classic(image: np.ndarray, h: float, t: int = 3, f: int = 3):
    """Direct port of the MATLAB NLmeansfilter loop semantics."""
    m, n = image.shape
    P = np.pad(image.astype(np.float64), f, mode="symmetric")
    k = np.zeros((2 * f + 1, 2 * f + 1))
    for d in range(1, f + 1):
        k[f - d : f + d + 1, f - d : f + d + 1] += 1.0 / (2 * d + 1) ** 2
    k /= f
    k /= k.sum()
    h2 = h * h
    out = np.zeros((m, n))
    for i in range(m):
        for j in range(n):
            i1, j1 = i + f, j + f
            W1 = P[i1 - f : i1 + f + 1, j1 - f : j1 + f + 1]
            wmax = 0.0
            sweight = 0.0
            average = 0.0
            for r in range(max(i1 - t, f), min(i1 + t, m + f - 1) + 1):
                for s in range(max(j1 - t, f), min(j1 + t, n + f - 1) + 1):
                    if r == i1 and s == j1:
                        continue
                    W2 = P[r - f : r + f + 1, s - f : s + f + 1]
                    d = np.sum(k * (W1 - W2) ** 2)
                    w = np.exp(-d / h2)
                    wmax = max(wmax, w)
                    sweight += w
                    average += w * P[r, s]
            average += wmax * P[i1, j1]
            sweight += wmax
            out[i, j] = average / sweight if sweight > 0 else image[i, j]
    return out


# ------------------------------------------------------------------ ista ---
def oracle_pruned_ista(y, D, missing_index, lam, n_iter, alpha_mode="trace4",
                       h_scale=1.0, nlm_fn=None):
    """Reference row-pruned PnP-ISTA (``ista`` + ``delete_element``)."""
    keep = np.ones(len(y), dtype=bool)
    keep[missing_index] = False
    H = D[keep]
    yk = np.asarray(y, dtype=np.float64)[keep].reshape(-1, 1)
    if alpha_mode == "trace4":
        alpha = 4.0 * np.trace(H.T @ H)
    elif alpha_mode == "specnorm":
        alpha = np.linalg.norm(H, 2) ** 2
    else:
        raise ValueError(alpha_mode)
    T = h_scale * lam / (2.0 * alpha)
    x = np.zeros((D.shape[1], 1))
    nlm = nlm_fn or (lambda g, h: oracle_nlm2d(g, h))
    for _ in range(n_iter):
        grad = x + H.T @ (yk - H @ x) / alpha
        x = np.asarray(nlm(grad, T)).reshape(-1, 1)
    return x


# ---------------------------------------------------------------- metric ---
def oracle_psnr(a, b):
    import math

    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * math.log10(255 / math.sqrt(mse))


def oracle_svt(X, tau):
    U, s, Vt = np.linalg.svd(np.asarray(X, np.float64), full_matrices=False)
    return (U * np.maximum(s - tau, 0.0)) @ Vt

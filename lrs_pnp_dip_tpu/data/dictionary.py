"""Sparse-coding dictionary learning (JAX, batched, MXU-friendly).

The reference ships ``trained_dictionary.mat`` only as a missing git-LFS blob
(see ``/root/reference/.MISSING_LARGE_BLOBS``), so this framework learns its
own dictionary.  We use alternating minimisation:

  * sparse step: batched ISTA with soft-thresholding over all training
    patches at once (one big (N, P) x (P, K) matmul pair per iteration);
  * dictionary step: method-of-optimal-directions (MOD),
    ``D = Y Z^T (Z Z^T + eps I)^{-1}``, then column normalisation
    (the MATLAB twin normalises columns too,
    reference ``LRS-PnP(Matlab Code)/columnNormalise.m``).

Patches are the same spatio-spectral blocks the solver codes against
(36 consecutive pixels x 36 consecutive bands of the matricized cube), so
the learned atoms live in exactly the space the PnP-ISTA stage needs.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def column_normalize(D: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Scale every atom (column) to unit l2 norm."""
    return D / (jnp.linalg.norm(D, axis=0, keepdims=True) + eps)


def random_dictionary(patch_dim: int, n_atoms: int, seed: int = 0) -> np.ndarray:
    """Gaussian random dictionary with unit-norm atoms (fallback/tests)."""
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((patch_dim, n_atoms)).astype(np.float32)
    return np.asarray(column_normalize(jnp.asarray(D)))


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _ista_code(Y, D, lam, n_iter: int):
    """Batched ISTA for min_Z 0.5||Y - D Z||^2 + lam ||Z||_1.

    Y: (P, N) patches as columns;  D: (P, K);  returns Z: (K, N).
    """
    L = jnp.linalg.norm(D, ord=2) ** 2 + 1e-6  # Lipschitz const of grad
    Z = jnp.zeros((D.shape[1], Y.shape[1]), Y.dtype)

    def body(Z, _):
        R = Y - D @ Z
        G = Z + (D.T @ R) / L
        Z = jnp.sign(G) * jnp.maximum(jnp.abs(G) - lam / L, 0.0)
        return Z, None

    Z, _ = jax.lax.scan(body, Z, None, length=n_iter)
    return Z


@functools.partial(jax.jit, static_argnames=("sparse_iters",))
def _mod_step(Y, D, lam, sparse_iters: int):
    Z = _ista_code(Y, D, lam, sparse_iters)
    K = D.shape[1]
    G = Z @ Z.T + 1e-6 * jnp.eye(K, dtype=Y.dtype)
    D_new = jnp.linalg.solve(G, (Y @ Z.T).T).T
    # Re-randomise (keep previous atom) where an atom collapsed to ~zero.
    norms = jnp.linalg.norm(D_new, axis=0, keepdims=True)
    D_new = jnp.where(norms > 1e-8, D_new, D)
    return column_normalize(D_new)


def extract_training_patches(
    cubes: Sequence[np.ndarray],
    block_size: int = 36,
    stride: int = 4,
    masks: Optional[Sequence[np.ndarray]] = None,
):
    """Spatio-spectral training patches from clean cubes.

    Each cube (H, W, B) is matricized to (H*W, B); patches are
    ``block_size`` consecutive pixel rows x ``block_size`` consecutive bands,
    flattened band-major to match the solver's block layout
    (:mod:`..ops.blocks`).  Returns (patch_dim, N).

    If ``masks`` is given (one (H, W) observation mask per cube, 1 =
    observed, broadcast over bands like the reference's mask handling,
    ``main_LRS_PnP_DIP_pro.py:311-313``), additionally returns the matching
    (patch_dim, N) mask patches so callers can exclude or down-weight
    unobserved entries.
    """
    from .io import matricize

    cols = []
    mask_cols = []
    for idx, cube in enumerate(cubes):
        Y = matricize(np.asarray(cube, dtype=np.float32))
        P, B = Y.shape
        if masks is not None:
            m2d = np.asarray(masks[idx], dtype=np.float32).reshape(-1)
            M = np.broadcast_to(m2d[:, None], (P, B))
        for x in range(0, P - block_size + 1, stride * block_size):
            for y in range(0, B - block_size + 1, stride):
                blk = Y[x : x + block_size, y : y + block_size]
                cols.append(blk.T.reshape(-1))  # band-major flatten
                if masks is not None:
                    mask_cols.append(M[x : x + block_size, y : y + block_size].T.reshape(-1))
    patches = np.stack(cols, axis=1)
    if masks is not None:
        return patches, np.stack(mask_cols, axis=1)
    return patches


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _ista_code_masked(Y, M, D, lam, n_iter: int):
    """Masked batched ISTA: min_Z 0.5||M (Y - D Z)||^2 + lam||Z||_1.

    Unobserved entries (M == 0) contribute nothing to the gradient, so the
    code is fit to the observed pixels only.
    """
    L = jnp.linalg.norm(D, ord=2) ** 2 + 1e-6
    Z = jnp.zeros((D.shape[1], Y.shape[1]), Y.dtype)

    def body(Z, _):
        R = M * (Y - D @ Z)
        G = Z + (D.T @ R) / L
        Z = jnp.sign(G) * jnp.maximum(jnp.abs(G) - lam / L, 0.0)
        return Z, None

    Z, _ = jax.lax.scan(body, Z, None, length=n_iter)
    return Z


@functools.partial(jax.jit, static_argnames=("sparse_iters", "dict_steps"))
def _masked_mod_step(Y, M, D, lam, sparse_iters: int, dict_steps: int = 8):
    """One masked alternating-minimisation sweep.

    The masked least-squares dictionary update has no batched closed form
    (every pixel row p solves its own (Z W_p Z^T) system), so the update is
    a few projected-gradient steps on 0.5||M (Y - D Z)||^2 with the step
    size 1/||Z||_2^2, followed by column normalisation.
    """
    Z = _ista_code_masked(Y, M, D, lam, sparse_iters)
    eta = 1.0 / (jnp.linalg.norm(Z, ord=2) ** 2 + 1e-6)

    def body(D, _):
        R = M * (Y - D @ Z)
        return D + eta * (R @ Z.T), None

    D, _ = jax.lax.scan(body, D, None, length=dict_steps)
    norms = jnp.linalg.norm(D, axis=0, keepdims=True)
    D = jnp.where(norms > 1e-8, D, D + 1e-3)  # revive collapsed atoms
    return column_normalize(D)


def load_trained_dictionary(n_atoms: int = 512) -> np.ndarray:
    """Load the shipped dictionary artifact (trained by
    ``scripts/train_dictionary.py`` — the reference's learned dictionary is
    a missing git-LFS blob, so the framework ships its own)."""
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "..", "artifacts",
        f"dictionary_36x36_k{n_atoms}.npz",
    )
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not found — run scripts/train_dictionary.py --atoms {n_atoms}"
        )
    return np.load(path)["dictionary"]


@functools.partial(jax.jit, static_argnames=("sparse_iters",))
def _aksvd_step(Y, D, lam, sparse_iters: int):
    """One approximate-K-SVD sweep (Rubinstein-style): sparse-code, then
    update every atom (and its coefficient row) against the residual,
    sequentially in a ``fori_loop``."""
    Z = _ista_code(Y, D, lam, sparse_iters)  # (K, N)
    R = Y - D @ Z  # residual, maintained incrementally

    def update_atom(k, carry):
        D, Z, R = carry
        d = jax.lax.dynamic_slice_in_dim(D, k, 1, axis=1)[:, 0]  # (P,)
        g = jax.lax.dynamic_slice_in_dim(Z, k, 1, axis=0)[0]  # (N,)
        # E_k = R + d g^T ;  d_new ∝ E_k g
        d_new = R @ g + d * jnp.dot(g, g)
        norm = jnp.linalg.norm(d_new)
        d_new = jnp.where(norm > 1e-8, d_new / jnp.maximum(norm, 1e-8), d)
        g_new = R.T @ d_new + g * jnp.dot(d, d_new)
        # keep the support of the sparse code (classic K-SVD updates only
        # coefficients that were already nonzero)
        g_new = jnp.where(g != 0, g_new, 0.0)
        R = R + jnp.outer(d, g) - jnp.outer(d_new, g_new)
        D = jax.lax.dynamic_update_slice_in_dim(D, d_new[:, None], k, axis=1)
        Z = jax.lax.dynamic_update_slice_in_dim(Z, g_new[None, :], k, axis=0)
        return D, Z, R

    D, Z, R = jax.lax.fori_loop(0, D.shape[1], update_atom, (D, Z, R))
    return column_normalize(D)


def learn_dictionary(
    patches: np.ndarray,
    n_atoms: int = 512,
    lam: float = 0.05,
    n_outer: int = 20,
    sparse_iters: int = 30,
    seed: int = 0,
    method: str = "mod",
    mask_patches: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Learn a (patch_dim, n_atoms) dictionary from (patch_dim, N) patches.

    ``method``: 'mod' (method of optimal directions; fast, batched) or
    'ksvd' (approximate K-SVD; per-atom rank-1 updates, the algorithm
    family the reference's MATLAB-era dictionary came from).

    ``mask_patches`` (same shape as ``patches``, 1 = observed): when given,
    learning is mask-aware — unobserved entries contribute to neither the
    sparse codes nor the dictionary update, so zero-filled holes never
    train into atoms.
    """
    patches = jnp.asarray(patches, dtype=jnp.float32)
    patch_dim, n = patches.shape
    rng = np.random.default_rng(seed)
    # Initialise atoms from random training patches (standard KSVD init);
    # under a mask, unobserved entries are zeroed so hole contents can
    # never leak into the initial atoms either.
    init_idx = rng.choice(n, size=n_atoms, replace=n < n_atoms)
    init_patches = patches
    if mask_patches is not None:
        init_patches = patches * jnp.asarray(mask_patches, dtype=jnp.float32)
    D = column_normalize(init_patches[:, init_idx] + 1e-3 * jnp.asarray(
        rng.standard_normal((patch_dim, n_atoms)), dtype=jnp.float32))
    if mask_patches is not None:
        M = jnp.asarray(mask_patches, dtype=jnp.float32)
        for _ in range(n_outer):
            D = _masked_mod_step(patches, M, D, lam, sparse_iters)
        return np.asarray(D)
    step = _mod_step if method == "mod" else _aksvd_step
    for _ in range(n_outer):
        D = step(patches, D, lam, sparse_iters)
    return np.asarray(D)

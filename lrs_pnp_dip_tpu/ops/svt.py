"""Singular-value thresholding (nuclear-norm prox) — the low-rank prior.

Reference semantics (``main_LRS_PnP.py:118-124``, MATLAB ``Do``/``So``
``main_LRS_PnP.m:241-250``): full SVD of the (P, B) iterate, soft-threshold
the singular values, recompose.

TPU-first design: LAPACK-style tall-skinny SVD maps poorly onto the MXU, but
for P >> B the same operator is exactly computable from the B x B Gram
matrix:

    G = X^T X = V S^2 V^T  (eigh, B x B)
    SVT_tau(X) = X V diag(shrink(s)/s) V^T        with s = sqrt(eig)

which is two MXU matmuls plus one tiny eigh.  This is also the distributed
form: with X sharded over pixels/patches, G is a ``psum`` of local Gramians
and every shard applies the same B x B spectral filter locally
(see :mod:`..parallel.collectives`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .shrinkage import soft_threshold


def svt(X: jnp.ndarray, tau) -> jnp.ndarray:
    """Direct SVD route (oracle / small problems)."""
    U, s, Vt = jnp.linalg.svd(X, full_matrices=False)
    return (U * soft_threshold(s, tau)[None, :]) @ Vt


def _gram_spectral_filter(G: jnp.ndarray, tau, eps: float = 1e-12):
    """Eigendecompose G = X^T X and build the per-eigvec shrink ratio."""
    w, V = jnp.linalg.eigh(G)
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    ratio = jnp.where(s > eps, soft_threshold(s, tau) / jnp.maximum(s, eps), 0.0)
    return V, ratio


def svt_gram(X: jnp.ndarray, tau) -> jnp.ndarray:
    """Gram + eigh route: exact SVT for any X with small trailing dim."""
    G = jnp.asarray(X, jnp.float32).T @ jnp.asarray(X, jnp.float32)
    V, ratio = _gram_spectral_filter(G, tau)
    return (X @ V) * ratio[None, :] @ V.T


def singular_values_gram(X: jnp.ndarray) -> jnp.ndarray:
    """Singular values (descending) via the Gram route.

    Replaces reference ``print_singular_value`` / ``Accu_Energy_ratio``
    numerics (``main_LRS_PnP_DIP_pro.py:110-115,174-182``).
    """
    G = X.T @ X
    w = jnp.linalg.eigvalsh(G)
    return jnp.sqrt(jnp.maximum(w, 0.0))[::-1]


def singular_energy_ratio(X: jnp.ndarray, p: int) -> jnp.ndarray:
    """Fraction of singular-value mass in the top p-1 values.

    Faithful to reference ``Accu_Energy_ratio`` (``:110-115``), including its
    quirk of summing the top ``p-1`` (not ``p``) values.
    """
    s = singular_values_gram(X)
    return jnp.sum(s[: p - 1]) / jnp.sum(s)

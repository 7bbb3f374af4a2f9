"""Explicit collective implementations of the distributed proxes.

The SVT of the pixel-sharded iterate is the one stage with real
cross-shard structure: ``G = X^T X`` sums over the sharded pixel axis.
``distributed_svt`` computes the local Gramian on each shard, ``psum``s
the BxB result over the ``patch`` axis (one ICI all-reduce of B*B*4
bytes), eigendecomposes the replicated Gramian on every device, and
applies the spectral filter to the local rows — no gather of X ever
happens.  (SURVEY §2.4/2.5: the TPU-native replacement for the
reference's LAPACK ``np.linalg.svd`` at ``main_LRS_PnP.py:120``.)
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.shrinkage import soft_threshold


def distributed_gram(X_local: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Local Gramian + psum over the sharded pixel axis (call inside
    shard_map)."""
    G_local = X_local.T @ X_local
    return jax.lax.psum(G_local, axis)


def _svt_from_gram(X_local, G, tau, eps=1e-12):
    w, V = jnp.linalg.eigh(G)
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    ratio = jnp.where(s > eps, soft_threshold(s, tau) / jnp.maximum(s, eps), 0.0)
    return (X_local @ V) * ratio[None, :] @ V.T


def distributed_svt(X_local: jnp.ndarray, tau, axis: str) -> jnp.ndarray:
    """SVT of a pixel-sharded (P_local, B) block (call inside shard_map)."""
    G = distributed_gram(X_local, axis)
    return _svt_from_gram(X_local, G, tau)


def make_distributed_svt(mesh: Mesh, axis: str = "patch") -> Callable:
    """A drop-in replacement for ``ops.svt.svt_gram`` that runs as a
    shard_map over ``mesh``: X rows sharded on ``axis``, result sharded the
    same way."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(axis, None),
    )
    def _svt(X_local, tau):
        return distributed_svt(X_local, tau.reshape(()), axis)

    def svt_fn(X, tau):
        return _svt(X, jnp.asarray(tau, jnp.float32).reshape(1))

    return svt_fn

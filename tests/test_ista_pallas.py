"""Pin the fused Pallas ISTA kernel against the XLA scan path.

Runs in interpreter mode on CPU (the Mosaic compiler path is exercised on
real TPU by bench.py and the driver's compile checks).
"""

import numpy as np
import jax.numpy as jnp

from lrs_pnp_dip_tpu.ops.ista import SparseProxConfig, pnp_ista_blocks
from lrs_pnp_dip_tpu.ops.ista_pallas import pnp_ista_blocks_pallas


def _problem(rng, P=48, K=32, nB=5):
    D = rng.standard_normal((P, K)).astype(np.float32)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    Y = rng.standard_normal((nB, P)).astype(np.float32)
    M = (rng.random((nB, P)) > 0.12).astype(np.float32)
    return jnp.asarray(Y), jnp.asarray(M), jnp.asarray(D)


def test_pallas_matches_xla_trace4(rng):
    Y, M, D = _problem(rng)
    cfg = SparseProxConfig(n_iter=15, alpha_mode="trace4")
    ref = np.asarray(pnp_ista_blocks(Y, M, D, cfg))
    pal = np.asarray(pnp_ista_blocks_pallas(Y, M, D, cfg, interpret=True))
    np.testing.assert_allclose(pal, ref, rtol=1e-4, atol=1e-6)


def test_pallas_matches_xla_specnorm(rng):
    Y, M, D = _problem(rng, nB=3)
    cfg = SparseProxConfig(n_iter=8, alpha_mode="specnorm", h_scale=0.1)
    ref = np.asarray(pnp_ista_blocks(Y, M, D, cfg))
    pal = np.asarray(pnp_ista_blocks_pallas(Y, M, D, cfg, interpret=True))
    np.testing.assert_allclose(pal, ref, rtol=1e-4, atol=1e-6)


def test_pallas_handles_nonmultiple_of_8_blocks(rng):
    Y, M, D = _problem(rng, nB=13)  # forces sublane padding
    cfg = SparseProxConfig(n_iter=5)
    ref = np.asarray(pnp_ista_blocks(Y, M, D, cfg))
    pal = np.asarray(pnp_ista_blocks_pallas(Y, M, D, cfg, interpret=True))
    np.testing.assert_allclose(pal, ref, rtol=1e-4, atol=1e-6)


def test_pallas_tiled_grid_large_block_count(rng):
    """A small VMEM budget must force multi-tile grids without changing
    results (tile-boundary exactness, incl. a padded final tile)."""
    Y, M, D = _problem(rng, P=64, K=32, nB=40)
    cfg = SparseProxConfig(n_iter=4)
    ref = np.asarray(pnp_ista_blocks(Y, M, D, cfg))
    # budget that fits the dictionary plus only a few blocks per tile
    tiny_budget = 2 * 64 * 32 * 4 + 3 * (2 * 64 + 2 * 32 + 10) * 4 * 16
    pal = np.asarray(
        pnp_ista_blocks_pallas(Y, M, D, cfg, interpret=True, vmem_budget=tiny_budget)
    )
    np.testing.assert_allclose(pal, ref, rtol=1e-4, atol=1e-6)


def test_pallas_bf16_matmuls_track_f32(rng):
    """matmul_dtype='bfloat16' (2x MXU option) must stay close to the f32
    path: the NLM shrinkage and carry are f32, so only the matmul operands
    are quantized (~3 decimal digits)."""
    Y, M, D = _problem(rng)
    cfg32 = SparseProxConfig(n_iter=10, alpha_mode="trace4")
    cfg16 = SparseProxConfig(n_iter=10, alpha_mode="trace4",
                             matmul_dtype="bfloat16")
    ref = np.asarray(pnp_ista_blocks_pallas(Y, M, D, cfg32, interpret=True))
    low = np.asarray(pnp_ista_blocks_pallas(Y, M, D, cfg16, interpret=True))
    assert np.isfinite(low).all()
    scale = np.abs(ref).max()
    assert np.abs(low - ref).max() < 0.02 * scale, (
        f"bf16 drift {np.abs(low - ref).max():.4g} vs scale {scale:.4g}"
    )

"""Cross-check the C++ native library against the JAX implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from lrs_pnp_dip_tpu import native
from lrs_pnp_dip_tpu.ops.blocks import block_grid, extract_blocks, scatter_blocks
from lrs_pnp_dip_tpu.ops.nlm import nlm2d, nlm_column_batch

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_nlm2d_matches_jax(rng):
    img = rng.random((15, 9)).astype(np.float32)
    for h in (0.05, 0.5):
        ours = native.nlm2d(img, h)
        expect = np.asarray(nlm2d(jnp.asarray(img), h))
        np.testing.assert_allclose(ours, expect, rtol=2e-4, atol=2e-5)


def test_native_column_batch_matches_jax(rng):
    V = rng.random((6, 40)).astype(np.float32)
    h = np.full((6,), 0.1, np.float32)
    ours = native.nlm_column_batch(V, h)
    expect = np.asarray(nlm_column_batch(jnp.asarray(V), jnp.asarray(h)))
    np.testing.assert_allclose(ours, expect, rtol=2e-4, atol=2e-5)


def test_native_blocks_roundtrip(rng):
    Y = rng.random((60, 23)).astype(np.float32)
    bb, stride = 8, 5
    g = block_grid(Y.shape, bb, stride)
    ours = native.extract_blocks(Y, bb, stride)
    expect = np.asarray(extract_blocks(jnp.asarray(Y), g))
    np.testing.assert_allclose(ours, expect, rtol=1e-6)

    im, wt = native.scatter_blocks(ours, Y.shape, bb, stride)
    np.testing.assert_allclose(
        im, np.asarray(scatter_blocks(jnp.asarray(ours), g)), rtol=1e-5
    )
    np.testing.assert_allclose(wt, np.asarray(g.weight()), rtol=1e-6)

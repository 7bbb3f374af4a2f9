import numpy as np
import jax
import jax.numpy as jnp

from lrs_pnp_dip_tpu.ops.nlm import (
    nlm2d,
    nlm_column,
    nlm_column_batch,
    nlm_column_batch_fast,
)
from reference_oracles import oracle_nlm2d, oracle_nlm_classic


def test_nlm2d_matches_direct_oracle(rng):
    img = rng.random((14, 9)).astype(np.float32)
    for h in (0.05, 0.3, 2.0):
        ours = np.asarray(nlm2d(jnp.asarray(img), h))
        expect = oracle_nlm2d(img, h)
        np.testing.assert_allclose(ours, expect, rtol=2e-4, atol=2e-5)


def test_nlm_column_matches_2d_on_column(rng):
    v = rng.random(40).astype(np.float32)
    ours = np.asarray(nlm_column(jnp.asarray(v), 0.1))
    expect = oracle_nlm2d(v[:, None], 0.1)[:, 0]
    np.testing.assert_allclose(ours, expect, rtol=2e-4, atol=2e-5)


def test_nlm_tiny_h_is_near_identity(rng):
    """The solver uses h ~ 1e-5: weights for any differing patch vanish and
    the denoiser must act as (near) identity — SURVEY §7 'hard parts'."""
    v = rng.random(64).astype(np.float32)
    out = np.asarray(nlm_column(jnp.asarray(v), 1e-5))
    np.testing.assert_allclose(out, v, atol=1e-5)


def test_nlm_large_h_smooths(rng):
    v = rng.random(64).astype(np.float32)
    out = np.asarray(nlm_column(jnp.asarray(v), 100.0))
    assert np.var(out) < 0.5 * np.var(v)


def test_nlm_classic_matches_matlab_oracle(rng):
    """The classic Buades NLM (wmax self-weight, symmetric pad, ring
    kernel, in-image search clamp) vs a direct port of NLmeansfilter.m."""
    from lrs_pnp_dip_tpu.ops.nlm import nlm_classic

    img = rng.random((12, 10)).astype(np.float32)
    for h in (0.05, 0.4):
        ours = np.asarray(nlm_classic(jnp.asarray(img), h))
        expect = oracle_nlm_classic(img, h)
        np.testing.assert_allclose(ours, expect, rtol=2e-4, atol=2e-5)


def test_nlm_classic_column_vector(rng):
    """MATLAB pnp_ista denoises the (K,1) gradient with NLmeansfilter."""
    from lrs_pnp_dip_tpu.ops.nlm import nlm_classic

    v = rng.random((30, 1)).astype(np.float32)
    ours = np.asarray(nlm_classic(jnp.asarray(v), 0.1))
    expect = oracle_nlm_classic(v, 0.1)
    np.testing.assert_allclose(ours, expect, rtol=2e-4, atol=2e-5)


def test_nlm_fast_column_matches_general(rng):
    """The hot-path 1-D specialisation must equal the general 2-D pairwise
    kernel on (K,1) inputs, across bandwidths and values."""
    for h in (1e-6, 0.01, 0.2, 5.0):
        V = rng.random((7, 50)).astype(np.float32)
        # include identical-neighbourhood structure to exercise weights
        V[2, 10:20] = V[2, 9]
        hs = jnp.full((7,), h, jnp.float32)
        fast = np.asarray(nlm_column_batch_fast(jnp.asarray(V), hs))
        ref = np.asarray(nlm_column_batch(jnp.asarray(V), hs))
        np.testing.assert_allclose(fast, ref, rtol=3e-5, atol=3e-6)


def test_nlm_batch_matches_single(rng):
    V = rng.random((5, 32)).astype(np.float32)
    h = np.full((5,), 0.2, np.float32)
    batched = np.asarray(nlm_column_batch(jnp.asarray(V), jnp.asarray(h)))
    for i in range(5):
        single = np.asarray(nlm_column(jnp.asarray(V[i]), 0.2))
        np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-6)

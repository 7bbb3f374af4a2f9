import numpy as np
import jax.numpy as jnp
import pytest

from lrs_pnp_dip_tpu.data.dictionary import (
    _ista_code,
    column_normalize,
    extract_training_patches,
    learn_dictionary,
    random_dictionary,
)


def _synthetic_patches(rng, P=32, K=24, N=400, sparsity=3):
    """Patches generated from a ground-truth dictionary."""
    D0 = rng.standard_normal((P, K)).astype(np.float32)
    D0 /= np.linalg.norm(D0, axis=0, keepdims=True)
    Z = np.zeros((K, N), np.float32)
    for j in range(N):
        idx = rng.choice(K, sparsity, replace=False)
        Z[idx, j] = rng.standard_normal(sparsity)
    return (D0 @ Z).astype(np.float32), D0


def _recon_error(patches, D, lam=0.02):
    Z = _ista_code(jnp.asarray(patches), jnp.asarray(D), lam, 80)
    rec = np.asarray(jnp.asarray(D) @ Z)
    return np.linalg.norm(rec - patches) / np.linalg.norm(patches)


@pytest.mark.parametrize("method", ["mod", "ksvd"])
def test_dictionary_learning_reduces_error(rng, method):
    patches, _ = _synthetic_patches(rng)
    D_rand = random_dictionary(32, 24, seed=1)
    err0 = _recon_error(patches, D_rand)
    D = learn_dictionary(patches, n_atoms=24, lam=0.02, n_outer=8,
                         sparse_iters=25, method=method)
    err1 = _recon_error(patches, D)
    assert err1 < 0.5 * err0
    np.testing.assert_allclose(np.linalg.norm(D, axis=0), 1.0, atol=1e-4)


def test_column_normalize():
    D = jnp.asarray(np.random.default_rng(0).random((10, 4)).astype(np.float32)) * 7
    Dn = np.asarray(column_normalize(D))
    np.testing.assert_allclose(np.linalg.norm(Dn, axis=0), 1.0, atol=1e-5)


def test_extract_training_patches_layout(rng):
    cube = rng.random((12, 12, 40)).astype(np.float32)
    patches = extract_training_patches([cube], block_size=8, stride=4)
    assert patches.shape[0] == 64
    # first patch must be the band-major flatten of Y[0:8, 0:8]
    Y = cube.reshape(144, 40)
    np.testing.assert_allclose(patches[:, 0], Y[0:8, 0:8].T.reshape(-1))


def test_extract_training_patches_with_masks(rng):
    cube = rng.random((12, 12, 40)).astype(np.float32)
    mask = (rng.random((12, 12)) > 0.3).astype(np.float32)
    patches, mask_patches = extract_training_patches(
        [cube], block_size=8, stride=4, masks=[mask]
    )
    assert patches.shape == mask_patches.shape
    # mask patches follow the same band-major layout, broadcast over bands
    m = np.broadcast_to(mask.reshape(-1)[:, None], (144, 40))
    np.testing.assert_allclose(mask_patches[:, 0], m[0:8, 0:8].T.reshape(-1))


def test_masked_learning_ignores_hole_contents(rng):
    """The dictionary learned with mask_patches must be invariant to the
    values stored in the masked-out entries (round-1 bug: zero-filled
    holes trained into atoms, api.py:16-36)."""
    patches, _ = _synthetic_patches(rng)
    mask = (rng.random(patches.shape) > 0.25).astype(np.float32)
    garbage = rng.standard_normal(patches.shape).astype(np.float32) * 50.0
    p_zero = patches * mask
    p_junk = patches * mask + garbage * (1 - mask)
    kw = dict(n_atoms=24, lam=0.02, n_outer=4, sparse_iters=15)
    D_zero = learn_dictionary(p_zero, mask_patches=mask, **kw)
    D_junk = learn_dictionary(p_junk, mask_patches=mask, **kw)
    np.testing.assert_allclose(D_zero, D_junk, atol=1e-5)
    # and masked learning on masked data should beat a random dictionary
    err_rand = _recon_error(patches, random_dictionary(32, 24, seed=1))
    err_mask = _recon_error(patches, D_zero)
    assert err_mask < err_rand


def test_auto_dictionary_excludes_holes(rng):
    """api._auto_dictionary must produce a dictionary that does not change
    when hole values change (they are excluded, per its docstring)."""
    from lrs_pnp_dip_tpu.api import _auto_dictionary
    from lrs_pnp_dip_tpu.data.io import HsiSample
    from lrs_pnp_dip_tpu.utils.config import SolverConfig

    H = W = 8
    B = 20
    cfg = SolverConfig(block_size=8, stride=8)
    clean = rng.random((H, W, B)).astype(np.float32)
    mask = np.ones((H, W), np.float32)
    mask[2, 3] = 0.0
    mask[5, 1] = 0.0
    noisy_zero = clean * mask[:, :, None]
    noisy_junk = noisy_zero + 99.0 * (1 - mask)[:, :, None]
    D1 = _auto_dictionary(
        HsiSample(noisy=noisy_zero, mask=mask, clean=None), cfg, n_atoms=16
    )
    D2 = _auto_dictionary(
        HsiSample(noisy=noisy_junk, mask=mask, clean=None), cfg, n_atoms=16
    )
    np.testing.assert_allclose(D1, D2, atol=1e-5)

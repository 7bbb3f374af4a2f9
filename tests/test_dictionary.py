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

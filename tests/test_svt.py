import numpy as np
import jax.numpy as jnp

from lrs_pnp_dip_tpu.ops.svt import svt, svt_gram, singular_values_gram
from reference_oracles import oracle_svt


def test_svt_direct_matches_oracle(rng):
    X = rng.standard_normal((50, 12)).astype(np.float32)
    tau = 0.7
    np.testing.assert_allclose(
        np.asarray(svt(jnp.asarray(X), tau)), oracle_svt(X, tau), atol=1e-4
    )


def test_svt_gram_matches_svd_route(rng):
    # Low-rank + noise, the structure SVT actually sees.
    A = rng.standard_normal((1296, 5)) @ rng.standard_normal((5, 128))
    X = (A + 0.1 * rng.standard_normal((1296, 128))).astype(np.float32)
    tau = 10.0
    ours = np.asarray(svt_gram(jnp.asarray(X), tau))
    expect = oracle_svt(X, tau)
    np.testing.assert_allclose(ours, expect, atol=2e-3)


def test_singular_values_gram(rng):
    X = rng.standard_normal((200, 16)).astype(np.float32)
    s_ref = np.linalg.svd(X, compute_uv=False)
    s_ours = np.asarray(singular_values_gram(jnp.asarray(X)))
    np.testing.assert_allclose(s_ours, s_ref, rtol=1e-3, atol=1e-3)

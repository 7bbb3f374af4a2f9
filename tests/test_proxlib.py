import numpy as np
import jax
import jax.numpy as jnp

from lrs_pnp_dip_tpu.ops.proxlib import (
    inpainting_operator,
    l1_project,
    l1_prox,
    linf_project,
    linf_prox,
    nlm_prox,
    simplex_project,
    superresolution_operator,
    tv_prox,
)


def test_inpainting_operator_adjoint(rng):
    op = inpainting_operator(jax.random.PRNGKey(0), (8, 8), 0.7)
    x = jnp.asarray(rng.random((8, 8)).astype(np.float32))
    y = jnp.asarray(rng.random((8, 8)).astype(np.float32))
    # <Ax, y> == <x, At y>
    np.testing.assert_allclose(
        float(jnp.sum(op.A(x) * y)), float(jnp.sum(x * op.At(y))), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(op.diag), np.asarray(op.A(jnp.ones((8, 8)))))


def test_superresolution_operator(rng):
    op = superresolution_operator((8, 8), 2)
    assert float(op.diag.sum()) == 16


def test_l1_prox_is_soft_threshold(rng):
    x = jnp.asarray(rng.standard_normal(20).astype(np.float32))
    expect = np.sign(x) * np.maximum(np.abs(np.asarray(x)) - 0.3, 0)
    np.testing.assert_allclose(np.asarray(l1_prox(x, 0.3)), expect, rtol=1e-6)


def test_tv_prox_smooths_and_fixes_constants(rng):
    c = jnp.ones((12, 12)) * 0.4
    np.testing.assert_allclose(np.asarray(tv_prox(c, 0.5)), 0.4, atol=1e-4)
    noisy = c + 0.2 * jnp.asarray(rng.standard_normal((12, 12)).astype(np.float32))
    den = tv_prox(noisy, 0.3)
    assert float(jnp.var(den)) < 0.3 * float(jnp.var(noisy))


def test_nlm_prox_runs(rng):
    x = jnp.asarray(rng.random((10, 10)).astype(np.float32))
    out = nlm_prox(x, 0.2)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_linf_projection():
    x = jnp.asarray([-3.0, 0.5, 2.0])
    np.testing.assert_allclose(np.asarray(linf_project(x, 1.0)), [-1.0, 0.5, 1.0])


def test_simplex_projection_properties(rng):
    x = jnp.asarray(rng.standard_normal(30).astype(np.float32))
    p = np.asarray(simplex_project(x, 1.0))
    assert abs(p.sum() - 1.0) < 1e-5 and (p >= -1e-7).all()
    # projecting a point already on the simplex is identity
    q = np.abs(rng.random(10)).astype(np.float32)
    q /= q.sum()
    np.testing.assert_allclose(np.asarray(simplex_project(jnp.asarray(q), 1.0)), q, atol=1e-5)


def test_l1_projection(rng):
    x = jnp.asarray(rng.standard_normal(15).astype(np.float32)) * 3
    p = np.asarray(l1_project(x, 1.0))
    assert abs(np.abs(p).sum() - 1.0) < 1e-4
    small = jnp.asarray([0.1, -0.2, 0.05])
    np.testing.assert_allclose(np.asarray(l1_project(small, 1.0)), np.asarray(small))


def test_linf_prox_moreau(rng):
    """prox_{tau||.||_inf}(x) + tau*proj_l1(x/tau) == x (Moreau identity)."""
    x = jnp.asarray(rng.standard_normal(12).astype(np.float32))
    tau = 0.7
    p = linf_prox(x, tau)
    q = tau * l1_project(x / tau, 1.0)
    np.testing.assert_allclose(np.asarray(p + q), np.asarray(x), atol=1e-5)

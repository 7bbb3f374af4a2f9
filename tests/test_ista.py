import numpy as np
import jax.numpy as jnp

from lrs_pnp_dip_tpu.ops.ista import (
    SparseProxConfig,
    pnp_ista_blocks,
    sparse_prox,
    _alpha_specnorm,
    _alpha_trace4,
)
from lrs_pnp_dip_tpu.ops.nlm import nlm_column
from reference_oracles import oracle_pruned_ista


def _jax_nlm(g, h):
    return np.asarray(nlm_column(jnp.asarray(g[:, 0].astype(np.float32)), float(h)))


def _problem(rng, P=48, K=20, nB=4, missing=6):
    D = rng.standard_normal((P, K)).astype(np.float32)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    Y = rng.standard_normal((nB, P)).astype(np.float32)
    M = np.ones((nB, P), np.float32)
    for j in range(nB):
        miss = rng.choice(P, size=missing, replace=False)
        M[j, miss] = 0.0
    return D, Y, M


def test_alpha_trace4_matches_pruned_trace(rng):
    D, Y, M = _problem(rng)
    alpha = np.asarray(_alpha_trace4(jnp.asarray(D), jnp.asarray(M)))
    for j in range(Y.shape[0]):
        H = D[M[j] > 0]
        np.testing.assert_allclose(alpha[j], 4 * np.trace(H.T @ H), rtol=1e-4)


def test_alpha_specnorm_matches_pruned_norm(rng):
    D, Y, M = _problem(rng)
    alpha = np.asarray(_alpha_specnorm(jnp.asarray(D), jnp.asarray(M), 100))
    for j in range(Y.shape[0]):
        H = D[M[j] > 0]
        np.testing.assert_allclose(alpha[j], np.linalg.norm(H, 2) ** 2, rtol=1e-3)


def test_masked_ista_equals_row_pruned_reference(rng):
    """The TPU-friendly masked reformulation must match the reference's
    ragged row-pruned ISTA exactly (same NLM denoiser plugged in)."""
    D, Y, M = _problem(rng, nB=3)
    cfg = SparseProxConfig(lambda_ista=0.1, n_iter=8, alpha_mode="trace4")
    ours = np.asarray(pnp_ista_blocks(jnp.asarray(Y), jnp.asarray(M), jnp.asarray(D), cfg))
    for j in range(Y.shape[0]):
        missing = np.where(M[j] == 0)[0]
        expect = oracle_pruned_ista(
            Y[j], D.astype(np.float64), missing, 0.1, 8,
            alpha_mode="trace4", nlm_fn=_jax_nlm,
        )[:, 0]
        np.testing.assert_allclose(ours[j], expect, rtol=1e-3, atol=1e-5)


def test_masked_ista_specnorm_mode(rng):
    D, Y, M = _problem(rng, nB=2)
    cfg = SparseProxConfig(
        lambda_ista=0.1, n_iter=5, alpha_mode="specnorm", h_scale=0.1, power_iters=100
    )
    ours = np.asarray(pnp_ista_blocks(jnp.asarray(Y), jnp.asarray(M), jnp.asarray(D), cfg))
    for j in range(Y.shape[0]):
        missing = np.where(M[j] == 0)[0]
        expect = oracle_pruned_ista(
            Y[j], D.astype(np.float64), missing, 0.1, 5,
            alpha_mode="specnorm", h_scale=0.1, nlm_fn=_jax_nlm,
        )[:, 0]
        np.testing.assert_allclose(ours[j], expect, rtol=1e-3, atol=1e-4)


def test_ista_classic_denoiser_mode(rng):
    """The MATLAB-twin denoiser plugs into the same masked ISTA."""
    from lrs_pnp_dip_tpu.ops.nlm import nlm_classic

    def _matlab_nlm(g, h):
        return np.asarray(nlm_classic(jnp.asarray(g.astype(np.float32)), float(h)))

    D, Y, M = _problem(rng, nB=2)
    cfg = SparseProxConfig(
        n_iter=5, alpha_mode="specnorm", h_scale=0.1,
        power_iters=100, denoiser="nlm_classic",
    )
    ours = np.asarray(pnp_ista_blocks(jnp.asarray(Y), jnp.asarray(M), jnp.asarray(D), cfg))
    for j in range(Y.shape[0]):
        missing = np.where(M[j] == 0)[0]
        expect = oracle_pruned_ista(
            Y[j], D.astype(np.float64), missing, 0.1, 5,
            alpha_mode="specnorm", h_scale=0.1, nlm_fn=_matlab_nlm,
        )[:, 0]
        np.testing.assert_allclose(ours[j], expect, rtol=1e-3, atol=1e-4)


def test_sparse_prox_reconstructs_with_full_dictionary(rng):
    D, Y, M = _problem(rng)
    cfg = SparseProxConfig(n_iter=5)
    coefs = np.asarray(pnp_ista_blocks(jnp.asarray(Y), jnp.asarray(M), jnp.asarray(D), cfg))
    phi = np.asarray(sparse_prox(jnp.asarray(Y), jnp.asarray(M), jnp.asarray(D), cfg))
    np.testing.assert_allclose(phi, coefs @ D.T, rtol=1e-4, atol=1e-5)


def test_ista_recovers_sparse_signal(rng):
    """End-to-end sanity: with an easy sparse ground truth, the prox output
    should be much closer to the clean signal than the corrupted input."""
    P, K = 64, 32
    D = rng.standard_normal((P, K)).astype(np.float32)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    z = np.zeros((K,), np.float32)
    z[rng.choice(K, 4, replace=False)] = rng.standard_normal(4).astype(np.float32)
    clean = D @ z
    M = np.ones((1, P), np.float32)
    M[0, rng.choice(P, 10, replace=False)] = 0.0
    y = (clean * M[0]).astype(np.float32)
    # The reference's alpha = 4*trace(H^T H) step size is ~K-times smaller
    # than the Lipschitz-optimal one, so convergence is heavily damped —
    # faithful behavior, hence the generous iteration count here.
    cfg = SparseProxConfig(n_iter=600)
    phi = np.asarray(
        sparse_prox(jnp.asarray(y[None]), jnp.asarray(M), jnp.asarray(D), cfg)
    )[0]
    err_out = np.linalg.norm(phi - clean)
    err_in = np.linalg.norm(y - clean)
    assert err_out < 0.5 * err_in


def test_precomputed_alpha_matches_in_step_alpha():
    """compute_alpha (hoisted once per problem into ProblemConsts) must be
    bit-identical to the in-call alpha for both step-size modes and both
    backends' entry points (round-5 outer-loop hoist)."""
    import numpy as np
    import jax.numpy as jnp

    from lrs_pnp_dip_tpu.ops.ista import (
        SparseProxConfig, compute_alpha, sparse_prox,
    )

    rng = np.random.default_rng(3)
    nB, P, K = 12, 64, 48
    blocks = jnp.asarray(rng.random((nB, P)).astype(np.float32))
    M = jnp.asarray((rng.random((nB, P)) > 0.1).astype(np.float32))
    D = jnp.asarray(rng.standard_normal((P, K)).astype(np.float32))
    for mode in ("trace4", "specnorm"):
        cfg = SparseProxConfig(n_iter=5, alpha_mode=mode, backend="xla",
                               power_iters=20)
        alpha = compute_alpha(D, M, cfg)
        out_in = sparse_prox(blocks, M, D, cfg)
        out_pre = sparse_prox(blocks, M, D, cfg, alpha=alpha)
        np.testing.assert_array_equal(np.asarray(out_in), np.asarray(out_pre))

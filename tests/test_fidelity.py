import numpy as np
import jax.numpy as jnp

from lrs_pnp_dip_tpu.ops.blocks import block_grid, extract_blocks
from lrs_pnp_dip_tpu.ops.fidelity import data_fidelity_update, dual_updates
from reference_oracles import oracle_get_image_blocks, oracle_scatter


def test_x_update_matches_reference_formula(rng):
    P, B, bb, stride = 60, 20, 10, 10
    g = block_grid((P, B), bb, stride)
    Y = rng.standard_normal((P, B)).astype(np.float32)
    mask = (rng.random((P, B)) > 0.1).astype(np.float32)
    U = rng.standard_normal((P, B)).astype(np.float32)
    l1 = rng.standard_normal((P, B)).astype(np.float32)
    l2 = rng.standard_normal((P, B)).astype(np.float32)
    phi = rng.standard_normal((g.n_blocks, bb * bb)).astype(np.float32)
    gamma, mu1, mu2 = 0.5, 0.1, 0.1

    X, im_out = data_fidelity_update(
        jnp.asarray(Y), jnp.asarray(mask), jnp.asarray(phi), jnp.asarray(U),
        jnp.asarray(l1), jnp.asarray(l2), g, gamma, mu1, mu2,
    )

    # independent oracle
    ref_im, ref_wt = oracle_scatter(np.asarray(phi).T, g.x_starts, g.y_starts, bb, (P, B))
    l1_blocks, rows, cols = oracle_get_image_blocks(l1, bb, stride)
    ref_l1s, _ = oracle_scatter(l1_blocks, rows, cols, bb, (P, B))
    ref_X = (gamma * Y + mu1 * ref_im + mu2 * U - ref_l1s - l2) / (
        gamma * mask + mu1 * ref_wt + mu2
    )
    np.testing.assert_allclose(np.asarray(X), ref_X, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(im_out), ref_im, rtol=1e-4, atol=1e-5)

    nl1, nl2 = dual_updates(jnp.asarray(l1), jnp.asarray(l2), X, im_out, jnp.asarray(U), mu1, mu2)
    np.testing.assert_allclose(np.asarray(nl1), l1 + mu1 * (np.asarray(X) - ref_im), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nl2), l2 + mu2 * (np.asarray(X) - U), rtol=1e-4, atol=1e-5)

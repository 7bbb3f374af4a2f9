import numpy as np
import jax.numpy as jnp

from lrs_pnp_dip_tpu.ops.blocks import block_grid, extract_blocks, scatter_blocks
from reference_oracles import oracle_get_image_blocks, oracle_scatter


def test_reference_grid_144_blocks():
    g = block_grid((1296, 128), 36, 36)
    assert g.n_blocks == 144
    # 36 pixel starts x (3 strided + 1 appended) band starts
    assert sorted(set(g.y_starts)) == [0, 36, 72, 92]
    assert len(set(g.x_starts)) == 36


def test_extract_matches_reference_oracle(rng):
    img = rng.standard_normal((50, 23)).astype(np.float32)
    bb, stride = 8, 5
    ref_blocks, ref_rows, ref_cols = oracle_get_image_blocks(img, bb, stride)
    g = block_grid(img.shape, bb, stride)
    ours = np.asarray(extract_blocks(jnp.asarray(img), g))
    assert ours.shape == (g.n_blocks, bb * bb)
    # ours is (nB, P) row-major; reference keeps (P, nB) columns
    np.testing.assert_allclose(ours.T, ref_blocks, rtol=1e-6)
    np.testing.assert_array_equal(np.array(g.x_starts), ref_rows)
    np.testing.assert_array_equal(np.array(g.y_starts), ref_cols)


def test_extract_matches_oracle_reference_shape(rng):
    img = rng.standard_normal((1296, 128)).astype(np.float32)
    ref_blocks, ref_rows, ref_cols = oracle_get_image_blocks(img, 36, 36)
    g = block_grid(img.shape, 36, 36)
    ours = np.asarray(extract_blocks(jnp.asarray(img), g))
    np.testing.assert_allclose(ours.T, ref_blocks, rtol=1e-6)


def test_scatter_matches_oracle(rng):
    img = rng.standard_normal((40, 17)).astype(np.float32)
    bb, stride = 6, 4
    g = block_grid(img.shape, bb, stride)
    blocks = np.asarray(extract_blocks(jnp.asarray(img), g))
    ref_im, ref_wt = oracle_scatter(blocks.T, g.x_starts, g.y_starts, bb, img.shape)
    ours_im = np.asarray(scatter_blocks(jnp.asarray(blocks), g))
    ours_wt = np.asarray(g.weight())
    np.testing.assert_allclose(ours_im, ref_im, rtol=1e-5)
    np.testing.assert_allclose(ours_wt, ref_wt, rtol=1e-6)


def test_scatter_weight_roundtrip(rng):
    """scatter(extract(img)) / weight == img wherever weight > 0."""
    img = rng.standard_normal((1296, 128)).astype(np.float32)
    g = block_grid(img.shape, 36, 36)
    acc = np.asarray(scatter_blocks(extract_blocks(jnp.asarray(img), g), g))
    wt = np.asarray(g.weight())
    assert wt.min() >= 1.0
    np.testing.assert_allclose(acc / wt, img, rtol=1e-5, atol=1e-6)


def test_structured_fast_path_matches_general_gather_scatter():
    """The regular-grid reshape/slice fast path must be bit-identical to the
    general gather/scatter (which stays the fallback for irregular grids)."""
    import numpy as np
    import jax.numpy as jnp

    from lrs_pnp_dip_tpu.ops import blocks as B

    rng = np.random.default_rng(0)
    for (P, Bands, bb) in [(1296, 128, 36), (144, 16, 12), (72, 20, 6)]:
        grid = B.block_grid((P, Bands), bb, bb)
        assert B._regular_layout(grid) is not None
        Y = jnp.asarray(rng.standard_normal((P, Bands)).astype(np.float32))
        rows, cols = B._gather_indices(grid)
        ref_blocks = Y[rows, cols].reshape(grid.n_blocks, bb * bb)
        got_blocks = B.extract_blocks(Y, grid)
        np.testing.assert_array_equal(np.asarray(got_blocks), np.asarray(ref_blocks))
        blk = jnp.asarray(
            rng.standard_normal((grid.n_blocks, bb * bb)).astype(np.float32)
        )
        ref_out = jnp.zeros(grid.shape, jnp.float32).at[rows, cols].add(
            blk.reshape(grid.n_blocks, bb, bb)
        )
        got_out = B.scatter_blocks(blk, grid)
        np.testing.assert_allclose(
            np.asarray(got_out), np.asarray(ref_out), rtol=1e-6, atol=1e-6
        )
    # irregular pixel grid (overlapping x starts) -> fallback must engage
    grid_ir = B.block_grid((100, 16), 12, 8)
    assert B._regular_layout(grid_ir) is None

import numpy as np
import pytest

from lrs_pnp_dip_tpu import native
from lrs_pnp_dip_tpu.data.tiles import TileLoader, mmap_cube, tile_origins


def test_tile_origins_cover_scene():
    o = tile_origins(100, 90, 36, 36)
    assert (o[:, 0].max() == 100 - 36) and (o[:, 1].max() == 90 - 36)
    # every pixel covered
    cov = np.zeros((100, 90), bool)
    for h0, w0 in o:
        cov[h0 : h0 + 36, w0 : w0 + 36] = True
    assert cov.all()


@pytest.mark.parametrize("use_native", [False, True])
def test_tile_loader_roundtrip(rng, use_native, tmp_path):
    if use_native and not native.available():
        pytest.skip("native toolchain unavailable")
    cube = rng.random((50, 40, 8)).astype(np.float32)
    loader = TileLoader(cube, (16, 16), batch_size=3, use_native=use_native)
    seen = 0
    for tiles, origins in loader.batches():
        assert tiles.shape[1:] == (16, 16, 8)
        for t, (h0, w0) in zip(tiles, origins):
            np.testing.assert_array_equal(t, cube[h0 : h0 + 16, w0 : w0 + 16])
        seen += len(origins)
    assert seen == loader.n_tiles


def test_mmap_cube(rng, tmp_path):
    cube = rng.random((20, 20, 4)).astype(np.float32)
    p = str(tmp_path / "cube.npy")
    np.save(p, cube)
    m = mmap_cube(p)
    loader = TileLoader(np.asarray(m), (10, 10), batch_size=2)
    total = sum(len(o) for _, o in loader.batches())
    assert total == loader.n_tiles

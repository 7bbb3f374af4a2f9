import numpy as np
import jax.numpy as jnp
import pytest

from lrs_pnp_dip_tpu.ops.metrics import psnr_ref, mpsnr, batch_mpsnr
from lrs_pnp_dip_tpu.ops.ssim import ssim
from lrs_pnp_dip_tpu.data.io import reference_data_available, load_reference_sample
from reference_oracles import oracle_psnr


def test_psnr_matches_oracle(rng):
    a = rng.random((36, 36)).astype(np.float32)
    b = rng.random((36, 36)).astype(np.float32)
    np.testing.assert_allclose(
        float(psnr_ref(jnp.asarray(a), jnp.asarray(b))), oracle_psnr(a, b), rtol=1e-5
    )


def test_mpsnr_is_bandwise_mean(rng):
    a = rng.random((8, 8, 5)).astype(np.float32)
    b = rng.random((8, 8, 5)).astype(np.float32)
    expect = np.mean([oracle_psnr(a[..., k], b[..., k]) for k in range(5)])
    np.testing.assert_allclose(float(mpsnr(jnp.asarray(a), jnp.asarray(b))), expect, rtol=1e-5)


def test_batch_mpsnr(rng):
    a = rng.random((3, 8, 8, 5)).astype(np.float32)
    b = rng.random((3, 8, 8, 5)).astype(np.float32)
    expect = np.mean(
        [np.mean([oracle_psnr(a[i, ..., k], b[i, ..., k]) for k in range(5)]) for i in range(3)]
    )
    np.testing.assert_allclose(
        float(batch_mpsnr(jnp.asarray(a), jnp.asarray(b))), expect, rtol=1e-5
    )


@pytest.mark.skipif(not reference_data_available(), reason="reference data not mounted")
def test_reference_input_mpsnr_is_33_074():
    """The reference hard-codes the img1 input MPSNR as 33.074
    (main_LRS_PnP_DIP_pro.py:344); our loader + metric must reproduce it."""
    s = load_reference_sample("img1", "mask1")
    val = float(mpsnr(jnp.asarray(s.clean), jnp.asarray(s.noisy)))
    assert abs(val - 33.074) < 5e-3


def test_ssim_range_and_identity(rng):
    a = rng.random((16, 16, 4)).astype(np.float32)
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) > 0.9999
    b = rng.random((16, 16, 4)).astype(np.float32)
    v = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert -1.0 <= v <= 1.0


def test_ssim_matlab_against_numpy_oracle(rng):
    """Wang ssim_index semantics: VALID gaussian windows, L=255, /3 quirk."""
    from scipy.signal import convolve2d

    from lrs_pnp_dip_tpu.ops.ssim import ssim_matlab

    a = (rng.random((20, 20)) * 255).astype(np.float32)
    b = (a + 12 * rng.standard_normal((20, 20))).astype(np.float32)

    x = np.arange(11, dtype=np.float64)
    g = np.exp(-((x - 5) ** 2) / (2 * 1.5**2)); g /= g.sum()
    w = np.outer(g, g)

    def filt(im):
        return convolve2d(im.astype(np.float64), w, mode="valid")

    mu1, mu2 = filt(a), filt(b)
    s11 = filt(a * a) - mu1**2
    s22 = filt(b * b) - mu2**2
    s12 = filt(a * b) - mu1 * mu2
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    smap = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1**2 + mu2**2 + C1) * (s11 + s22 + C2)
    )
    expect = smap.mean()
    ours = float(ssim_matlab(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, expect, rtol=1e-4)
    # 3-channel: sum/3 equals channel mean
    a3 = np.stack([a, a, a], -1)
    b3 = np.stack([b, b, b], -1)
    ours3 = float(ssim_matlab(jnp.asarray(a3), jnp.asarray(b3)))
    np.testing.assert_allclose(ours3, expect, rtol=1e-4)
    # border crop changes the map extent
    cropped = float(ssim_matlab(jnp.asarray(a), jnp.asarray(b), border=(3, 3)))
    assert cropped != ours


def test_ssim_matches_torch_oracle(rng):
    """Pin against an independent torch implementation of the same formula
    (11x11 gaussian sigma 1.5, zero-padded depthwise conv, C1/C2 std)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    a = rng.random((12, 12, 3)).astype(np.float32)
    b = (a + 0.1 * rng.standard_normal((12, 12, 3))).astype(np.float32)

    x = np.arange(11, dtype=np.float64)
    g = np.exp(-((x - 5) ** 2) / (2 * 1.5**2))
    g /= g.sum()
    w2 = np.outer(g, g).astype(np.float32)
    C = 3
    win = torch.tensor(np.tile(w2[None, None], (C, 1, 1, 1)))
    ta = torch.tensor(a.transpose(2, 0, 1)[None])
    tb = torch.tensor(b.transpose(2, 0, 1)[None])

    def filt(t):
        return F.conv2d(t, win, padding=5, groups=C)

    mu1, mu2 = filt(ta), filt(tb)
    s11 = filt(ta * ta) - mu1 * mu1
    s22 = filt(tb * tb) - mu2 * mu2
    s12 = filt(ta * tb) - mu1 * mu2
    C1, C2 = 0.01**2, 0.03**2
    smap = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1**2 + mu2**2 + C1) * (s11 + s22 + C2)
    )
    expect = float(smap.mean())
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, expect, rtol=1e-4)

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lrs_pnp_dip_tpu.models import (
    BatchNorm2d,
    DeepDecoder,
    Downsampler,
    LipschitzUNet,
    ResDecoder,
    ResNet,
    Skip,
    TextureNet,
    UNet,
    UNet3D,
    dip_skip_128,
    get_net,
)
from lrs_pnp_dip_tpu.models.lipschitz import SNConv2d, _sigma_max_exact, _sigma_max_power


def _init_apply(model, x, seed=0):
    variables = model.init(jax.random.PRNGKey(seed), x)
    extra = [k for k in variables if k != "params"]
    if extra:
        out, _ = model.apply(variables, x, mutable=extra)
    else:
        out = model.apply(variables, x)
    return out, variables


def test_skip_128_shapes():
    """The flagship DIP net must map (1,36,36,128) -> (1,36,36,128) with
    sigmoid range, like reference skip(128,128,[128]*5,...)."""
    x = jnp.asarray(np.random.default_rng(0).random((1, 36, 36, 128)), jnp.float32)
    out, variables = _init_apply(dip_skip_128(128), x)
    assert out.shape == (1, 36, 36, 128)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert n_params > 1e6  # 5-scale 128-wide hourglass is a real net


def test_skip_small_config():
    x = jnp.asarray(np.random.default_rng(1).random((1, 32, 32, 8)), jnp.float32)
    model = Skip(
        num_output_channels=8,
        channels_down=(16, 16),
        channels_up=(16, 16),
        channels_skip=(4, 4),
        pad="reflection",
    )
    out, _ = _init_apply(model, x)
    assert out.shape == (1, 32, 32, 8)


def test_lipschitz_unet_shapes():
    x = jnp.asarray(np.random.default_rng(2).random((1, 36, 36, 128)), jnp.float32)
    out, _ = _init_apply(LipschitzUNet(num_output_channels=128), x)
    assert out.shape == (1, 36, 36, 128)


@pytest.mark.parametrize("size", [48, 72])
def test_lipschitz_unet_size_generic(size):
    """The reference architecture only closes for 36-like spatial sizes
    (``my_Lipschitz_Unet.py:21-148``); the rebuild mirror-resizes each up
    stage so any tile size returns to the input shape (VERDICT r3 #9)."""
    x = jnp.asarray(
        np.random.default_rng(3).random((1, size, size, 8)), jnp.float32
    )
    out, _ = _init_apply(LipschitzUNet(num_output_channels=8, width=8), x)
    assert out.shape == (1, size, size, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_sigma_power_matches_exact(rng):
    w = jnp.asarray(rng.standard_normal((64, 230)).astype(np.float32))
    exact = float(_sigma_max_exact(w))
    u0 = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    approx, _ = _sigma_max_power(w, u0, 50)
    np.testing.assert_allclose(float(approx), exact, rtol=1e-3)


def test_snconv_constrains_lipschitz(rng):
    """||f(x)-f(y)|| <= ln_lambda * ||x-y|| for the 1x1 SN conv (for 1x1
    convs the reshaped-weight sigma IS the conv operator norm)."""
    model = SNConv2d(features=16, kernel_size=1, ln_lambda=1.0, use_bias=False,
                     sn_mode="exact")
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32)) * 10
    y = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32)) * 10
    variables = model.init(jax.random.PRNGKey(0), x)
    # inflate the kernel so the constraint actually binds
    big = jax.tree.map(lambda p: p * 50.0, variables["params"])
    fx = model.apply({"params": big}, x)
    fy = model.apply({"params": big}, y)
    lhs = float(jnp.linalg.norm(fx - fy))
    rhs = float(jnp.linalg.norm(x - y))
    assert lhs <= rhs * 1.001


@pytest.mark.parametrize(
    "name,chan", [("UNet", 8), ("ResNet", 8), ("skip", 8), ("texture_nets", 3),
                  ("deep_decoder", 3), ("res_decoder", 3)]
)
def test_factory_models_run(name, chan):
    if name in ("deep_decoder", "res_decoder"):
        x = jnp.asarray(np.random.default_rng(3).random((1, 2, 2, 16)), jnp.float32)
    elif name == "texture_nets":
        x = jnp.asarray(np.random.default_rng(3).random((1, 32, 32, 8)), jnp.float32)
    else:
        x = jnp.asarray(np.random.default_rng(3).random((1, 32, 32, 8)), jnp.float32)
    model = get_net(x.shape[-1], name, pad="reflection", n_channels=chan)
    out, _ = _init_apply(model, x)
    assert out.ndim == 4 and out.shape[-1] == chan
    assert np.isfinite(np.asarray(out)).all()


def test_unet3d_runs():
    x = jnp.asarray(np.random.default_rng(4).random((1, 16, 16, 16, 1)), jnp.float32)
    out, _ = _init_apply(UNet3D(num_output_channels=1), x)
    assert out.shape == (1, 16, 16, 16, 1)


def test_downsampler_box_average():
    x = jnp.ones((1, 8, 8, 3))
    out, _ = _init_apply(Downsampler(factor=2, kernel_type="box", phase=0.5), x)
    assert out.shape == (1, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_downsampler_lanczos_preserve_size():
    x = jnp.asarray(np.random.default_rng(5).random((1, 16, 16, 2)), jnp.float32)
    out, _ = _init_apply(Downsampler(factor=2, kernel_type="lanczos2", phase=0.5,
                                     preserve_size=True), x)
    assert out.shape == (1, 8, 8, 2)


def test_batchnorm_train_mode(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 5, 3)).astype(np.float32) * 4 + 2)
    out, _ = _init_apply(BatchNorm2d(), x)
    m = np.asarray(out).mean(axis=(0, 1, 2))
    v = np.asarray(out).var(axis=(0, 1, 2))
    np.testing.assert_allclose(m, 0, atol=1e-4)
    np.testing.assert_allclose(v, 1, atol=1e-2)


def test_attention_blocks(rng):
    from lrs_pnp_dip_tpu.models import MultiHeadAttention, PositionwiseFeedForward

    x = jnp.asarray(rng.standard_normal((2, 10, 32)).astype(np.float32))
    mha = MultiHeadAttention(n_head=4, d_model=32, d_k=8, d_v=8)
    (out, attn), _ = _init_apply_mha(mha, x)
    assert out.shape == (2, 10, 32)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)
    ff = PositionwiseFeedForward(d_hid=64)
    v = ff.init(jax.random.PRNGKey(0), x)
    y = ff.apply(v, x)
    assert y.shape == x.shape


def _init_apply_mha(mha, x):
    variables = mha.init(jax.random.PRNGKey(0), x, x, x)
    return mha.apply(variables, x, x, x), variables

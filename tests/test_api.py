import numpy as np
import jax.numpy as jnp

import lrs_pnp_dip_tpu as lrs
from lrs_pnp_dip_tpu.data.masks import synthetic_sample
from lrs_pnp_dip_tpu.ops.ista import SparseProxConfig
from lrs_pnp_dip_tpu.ops.metrics import mpsnr
from lrs_pnp_dip_tpu.utils.config import SolverConfig


def test_inpaint_one_call_auto_dictionary():
    s = synthetic_sample(height=16, width=16, bands=24, missing=0.08, seed=21)
    cfg = SolverConfig(
        variant="lrs_pnp", outer_iters=2, block_size=8, stride=8,
        sparse=SparseProxConfig(n_iter=10, alpha_mode="specnorm", h_scale=0.1),
        dip=None, mu1=0.15, mu2=0.9,
    )
    cube, hist = lrs.inpaint(s.noisy, s.mask, config=cfg, clean=s.clean)
    assert cube.shape == s.noisy.shape
    inp = float(mpsnr(jnp.asarray(s.clean), jnp.asarray(s.noisy)))
    assert hist["mpsnr"][-1] > inp - 0.5  # no divergence; usually improves


def test_inpaint_seed_ensemble():
    """seeds=[...] runs the ensemble engine and returns the mean cube."""
    from lrs_pnp_dip_tpu.solvers.dip import DipConfig

    s = synthetic_sample(height=16, width=16, bands=16, missing=0.08, seed=22)
    cfg = SolverConfig(
        variant="dip", outer_iters=2, block_size=8, stride=8,
        sparse=SparseProxConfig(n_iter=4),
        dip=DipConfig(num_iter=4, learning_rate=0.05, buffer_size=3, patience=10),
    )
    cube, hist = lrs.inpaint(
        s.noisy, s.mask, config=cfg, clean=s.clean, seeds=[0, 1]
    )
    assert cube.shape == s.noisy.shape
    assert hist["mpsnr"].shape == (2, 2)
    assert hist["ens_mpsnr"].shape == (2,)
    assert np.isfinite(hist["ens_mpsnr"]).all()


def test_config_dip_net_selection():
    from lrs_pnp_dip_tpu.solvers.admm import default_net
    from lrs_pnp_dip_tpu.utils.config import dip_preset

    net = default_net(dip_preset(dip_net="deep_decoder"), 16)
    from lrs_pnp_dip_tpu.models import DeepDecoder

    assert isinstance(net, DeepDecoder)


def test_inpaint_scene_whole_scene_auto_dictionary():
    """inpaint_scene: arbitrary scene size, auto-learned dictionary,
    tile streaming — recovery must improve over the input."""
    s = synthetic_sample(height=32, width=24, bands=16, missing=0.06, seed=23)
    cfg = SolverConfig(
        variant="lrs_pnp", outer_iters=2, block_size=8, stride=8,
        sparse=SparseProxConfig(n_iter=8, alpha_mode="specnorm", h_scale=0.1),
        dip=None, mu1=0.15, mu2=0.9,
    )
    cube = lrs.inpaint_scene(
        s.noisy, s.mask, config=cfg, tile_shape=(16, 8), tile_batch=2
    )
    assert cube.shape == s.noisy.shape
    inp = float(mpsnr(jnp.asarray(s.clean), jnp.asarray(s.noisy)))
    out = float(mpsnr(jnp.asarray(s.clean), jnp.asarray(cube)))
    assert out > inp

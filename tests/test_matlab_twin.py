"""The assembled MATLAB-twin experiment (A12 completion, VERDICT item 6).

Pieces pinned individually in round 1 (strip_mask / corrupt / specnorm
alpha / nlm_classic); these tests pin the *assembly*: the exact
``main_LRS_PnP.m`` mask geometry, the preset constants, and that the
composed 13-iteration experiment actually inpaints (MPSNR rises).
"""

import numpy as np
import jax.numpy as jnp

from lrs_pnp_dip_tpu.data import random_dictionary
from lrs_pnp_dip_tpu.data.masks import matlab_strip_mask, matlab_twin_sample
from lrs_pnp_dip_tpu.ops.metrics import mpsnr
from lrs_pnp_dip_tpu.solvers import Solver
from lrs_pnp_dip_tpu.utils.config import PRESETS, matlab_preset


def test_matlab_strip_mask_geometry():
    """66 dead pixels at the exact main_LRS_PnP.m:34-38 boxes."""
    m = matlab_strip_mask()
    assert m.shape == (36, 36)
    assert int((m == 0).sum()) == 66  # BASELINE.md first-mask density
    # spot-check MATLAB 1-indexed inclusive boxes: msk(8:13,27:28)=dead
    assert m[7:13, 26:28].sum() == 0 and m[6, 26] == 1 and m[13, 26] == 1
    # msk(4:5,7:12)
    assert m[3:5, 6:12].sum() == 0 and m[2, 6] == 1 and m[5, 6] == 1


def test_matlab_preset_constants():
    """main_LRS_PnP.m:57-70 / pnp_ista.m constants, assembled."""
    cfg = matlab_preset()
    assert cfg.variant == "lrs_pnp"
    assert cfg.gamma == 0.5 and cfg.mu1 == 0.15 and cfg.mu2 == 0.15
    assert cfg.outer_iters == 13
    assert cfg.sparse.n_iter == 80
    assert cfg.sparse.alpha_mode == "specnorm"
    assert cfg.sparse.h_scale == 0.1
    assert cfg.sparse.denoiser == "nlm_classic"
    assert PRESETS["matlab"] is matlab_preset


def test_matlab_twin_experiment_inpaints():
    """The composed experiment raises MPSNR over the corrupted input.

    Shortened for CPU test time (3 of 13 outer iterations, Nit 12 of 80,
    64 bands); the full experiment runs via scripts/run_matlab_twin.py.
    """
    import dataclasses

    sample = matlab_twin_sample(seed=0, bands=64)
    assert sample.noisy.shape == (36, 36, 64)
    assert int((sample.mask == 0).sum()) == 66
    cfg = matlab_preset(outer_iters=3)
    cfg = dataclasses.replace(
        cfg, sparse=dataclasses.replace(cfg.sparse, n_iter=12)
    )
    D = random_dictionary(36 * 36, 128, seed=0)
    solver = Solver(sample, D, cfg)
    _, hist = solver.run()
    inp = float(mpsnr(jnp.asarray(sample.clean), jnp.asarray(sample.noisy)))
    assert hist["best_mpsnr"] > inp + 0.5, (
        f"twin failed to inpaint: input {inp:.3f}, best {hist['best_mpsnr']:.3f}"
    )

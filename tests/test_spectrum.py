"""Spectrum-comparison harness test (VERDICT round-1 item 8; mirrors the
reference's ``results/spectrum/<method>/K.npy`` artifacts)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from lrs_pnp_dip_tpu.data import random_dictionary
from lrs_pnp_dip_tpu.data.masks import synthetic_sample


def test_spectrum_harness_tiny(tmp_path):
    import dataclasses

    import run_spectrum as rs
    from lrs_pnp_dip_tpu.models import Skip
    from lrs_pnp_dip_tpu.solvers.dip import DipConfig
    from lrs_pnp_dip_tpu.ops.ista import SparseProxConfig
    from lrs_pnp_dip_tpu.utils.config import dip_preset

    sample = synthetic_sample(height=16, width=16, bands=16, missing=0.1, seed=4)
    pixel = rs.pick_tracked_pixel(sample)
    assert sample.mask.reshape(-1)[pixel] == 0  # tracks a missing pixel

    # fit-style method (tiny skip net, tiny budget)
    tiny = Skip(num_output_channels=16, channels_down=(8, 8), channels_up=(8, 8),
                channels_skip=(4, 4), pad="reflection")
    spec, iters, cube = rs.trace_fit(
        tiny, sample, pixel, n_iter=6, record_every=3, input_shape=(1, 16, 16, 16)
    )
    assert spec.shape == (2, 16) and np.isfinite(spec).all()
    assert cube.shape == sample.shape

    # PnP-DIP (DIP prox + fidelity only)
    spec2, iters2, cube2 = rs.trace_pnp_dip(
        sample, pixel, outer_iters=2,
        dip_cfg=DipConfig(num_iter=4, buffer_size=3, patience=10),
    )
    assert spec2.shape == (2, 16) and np.isfinite(spec2).all()

    # full-solver trace
    D = random_dictionary(64, 32, seed=1)
    cfg = dip_preset(
        outer_iters=2, block_size=8, stride=8,
        sparse=SparseProxConfig(n_iter=3),
        dip=DipConfig(num_iter=4, buffer_size=3, patience=10),
        dip_net="skip_tiny",
    )
    # the preset path builds the full-size net from dip_net; use the
    # solver directly with the tiny net via trace_solver's cfg — the
    # 'default' key builds width-128 nets, too slow for CPU; so call
    # Solver with net explicitly instead.
    from lrs_pnp_dip_tpu.solvers import Solver

    solver = Solver(sample, D, dataclasses.replace(cfg, dip_net="default"), net=tiny)
    spectra = []

    def cb(i, state, aux):
        spectra.append(np.asarray(state.X)[pixel])

    solver.run(callback=cb)
    assert len(spectra) == 2 and np.isfinite(np.asarray(spectra)).all()

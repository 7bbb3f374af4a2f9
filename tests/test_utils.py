import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lrs_pnp_dip_tpu.data import random_dictionary
from lrs_pnp_dip_tpu.data.masks import synthetic_sample
from lrs_pnp_dip_tpu.ops.ista import SparseProxConfig
from lrs_pnp_dip_tpu.solvers import Solver
from lrs_pnp_dip_tpu.solvers.admm import init_state
from lrs_pnp_dip_tpu.utils.checkpoint import SolverCheckpointer
from lrs_pnp_dip_tpu.utils.config import SolverConfig
from lrs_pnp_dip_tpu.utils.logging import MetricLogger, StageTimer
from lrs_pnp_dip_tpu.utils.noise import get_noise


def _small_problem():
    s = synthetic_sample(height=12, width=12, bands=16, missing=0.1, seed=6)
    D = random_dictionary(36, 24, seed=1)
    cfg = SolverConfig(
        variant="lrs_pnp", outer_iters=2, block_size=6, stride=6,
        sparse=SparseProxConfig(n_iter=4), dip=None,
    )
    return s, D, cfg


def test_checkpoint_resume_exact(tmp_path):
    """Restore + continue must equal an uninterrupted run (exact resume)."""
    s, D, cfg = _small_problem()
    solver = Solver(s, D, cfg)
    st = solver.init_state()
    st1, _ = solver.step(st)
    ck = SolverCheckpointer(str(tmp_path / "ckpt"))
    ck.save(int(st1.itr), st1)
    st2, _ = solver.step(st1)

    restored = ck.restore()
    assert restored is not None
    assert int(restored.itr) == int(st1.itr)
    np.testing.assert_array_equal(np.asarray(restored.X), np.asarray(st1.X))
    st2_resumed, _ = solver.step(restored)
    np.testing.assert_allclose(
        np.asarray(st2_resumed.X), np.asarray(st2.X), atol=1e-6
    )


def test_metric_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricLogger(path, echo=False)
    log.log(iter=0, mpsnr=33.0)
    log.log(iter=1, mpsnr=34.5)
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[1]["mpsnr"] == 34.5 and "t" in lines[0]


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2


def test_viz_panels(tmp_path):
    s, D, cfg = _small_problem()
    solver = Solver(s, D, cfg)
    st, aux = solver.step(solver.init_state())
    from lrs_pnp_dip_tpu.utils.viz import save_convergence_figure, save_iteration_panel

    p = str(tmp_path / "panel.png")
    save_iteration_panel(p, s, solver, st, aux, band=5)
    assert os.path.getsize(p) > 1000
    c = str(tmp_path / "conv.png")
    save_convergence_figure(c, [1, 2], [1, 2], [1, 2], [33, 34])
    assert os.path.getsize(c) > 1000


def test_profiler_trace(tmp_path):
    from lrs_pnp_dip_tpu.utils.profiling import annotate, trace

    d = str(tmp_path / "prof")
    with trace(d):
        with annotate("stage"):
            jnp.sum(jnp.ones((8, 8))).block_until_ready()
    import glob

    assert glob.glob(os.path.join(d, "**", "*"), recursive=True)


def test_gen_noise_module(rng):
    from lrs_pnp_dip_tpu.models import GenNoise

    m = GenNoise(dim2=7)
    x = jnp.ones((2, 4, 4, 3))
    variables = m.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    y = m.apply(variables, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert y.shape == (2, 4, 4, 7)
    assert abs(float(y.mean())) < 0.2  # standard normal


def test_singular_energy_ratio(rng):
    from lrs_pnp_dip_tpu.ops.svt import singular_energy_ratio

    X = jnp.asarray(rng.standard_normal((50, 10)).astype(np.float32))
    s = np.linalg.svd(np.asarray(X), compute_uv=False)
    expect = s[:4].sum() / s.sum()  # reference sums top p-1
    np.testing.assert_allclose(float(singular_energy_ratio(X, 5)), expect, rtol=1e-3)


def test_get_noise_shapes():
    x = get_noise(jax.random.PRNGKey(0), 8, (16, 16))
    assert x.shape == (1, 16, 16, 8)
    assert float(jnp.abs(x).max()) <= 0.1 + 1e-6
    g = get_noise(jax.random.PRNGKey(0), 2, (8, 8), method="meshgrid")
    assert g.shape == (1, 8, 8, 2)
    n3 = get_noise(jax.random.PRNGKey(0), 1, (4, 8, 8), noise_type="n")
    assert n3.shape == (1, 4, 8, 8, 1)

import numpy as np
import jax
import jax.numpy as jnp

from lrs_pnp_dip_tpu.models import Skip
from lrs_pnp_dip_tpu.solvers.dip import DipConfig, make_dip_fit
from lrs_pnp_dip_tpu.solvers.early_stop import init_early_stop, update_early_stop
from lrs_pnp_dip_tpu.solvers.fit import FitConfig, fit


def _tiny_net(out_ch):
    return Skip(
        num_output_channels=out_ch,
        channels_down=(8, 8),
        channels_up=(8, 8),
        channels_skip=(4, 4),
        pad="reflection",
    )


def test_early_stop_state_machine():
    """Variance improving -> no stop; flat variance -> stop after patience
    checks once the window is full (reference EarlyStop.check_stop)."""
    es = init_early_stop(size=4, dim=3)
    # fill with identical images: variance = 0 -> best improves once, then
    # wait grows on every subsequent equal-variance check
    x = jnp.ones(3)
    for i in range(4):
        es = update_early_stop(es, x, i, patience=3)
    assert not bool(es.stop)
    assert float(es.best_score) == 0.0
    for i in range(4, 8):
        es = update_early_stop(es, x, i, patience=3)
    assert bool(es.stop)


def test_early_stop_waits_for_window_fill():
    es = init_early_stop(size=10, dim=2)
    for i in range(9):
        es = update_early_stop(es, jnp.ones(2) * i, i, patience=1)
    # window not yet full: best_score untouched, no stop
    assert not bool(es.stop)
    assert np.isinf(float(es.best_score))


def test_early_stop_incremental_matches_exact():
    """The O(D) sufficient-statistics evaluator must track the exact
    windowed variance through >2 ring wraps (including the periodic
    resync), on data whose variance actually moves."""
    rng = np.random.default_rng(0)
    size, dim = 6, 32
    es_e = init_early_stop(size, dim)
    es_i = init_early_stop(size, dim, incremental=True)
    base = rng.random(dim).astype(np.float32)
    for i in range(3 * size + 2):
        # shrinking perturbations: variance decreases, then flattens
        row = jnp.asarray(base + rng.normal(0, 0.5 / (1 + i), dim).astype(np.float32))
        es_e = update_early_stop(es_e, row, i, patience=4)
        es_i = update_early_stop(es_i, row, i, patience=4)
        assert bool(es_e.stop) == bool(es_i.stop)
    np.testing.assert_allclose(
        float(es_i.best_score), float(es_e.best_score), rtol=1e-4, atol=1e-7
    )
    assert int(es_i.best_iter) == int(es_e.best_iter)
    assert int(es_i.wait) == int(es_e.wait)
    # the running stats (about the shifted origin) equal the window column
    # sums after resyncs+updates: sum(w - c) + size*c == sum(w)
    np.testing.assert_allclose(
        np.asarray(es_i.sum) + size * np.asarray(es_i.origin),
        np.asarray(es_i.window).sum(0),
        rtol=1e-4, atol=1e-5,
    )


def test_early_stop_incremental_no_cancellation_at_tiny_variance():
    """ADVICE r4: accumulating s2/n - ave^2 about origin 0 loses ~eps*mean^2
    absolute accuracy — 100% relative error when var ~1e-7 at mean ~1, the
    well-converged plateau where the stop decision is made.  The shifted-
    origin statistics must track the exact evaluator there."""
    rng = np.random.default_rng(7)
    size, dim = 8, 64
    es_e = init_early_stop(size, dim)
    es_i = init_early_stop(size, dim, incremental=True)
    base = (1.0 + 0.1 * rng.random(dim)).astype(np.float32)  # mean ~1
    sigma = 3.2e-4  # per-pixel deviations -> window variance ~1e-7
    exact_scores, inc_scores = [], []
    for i in range(3 * size + 3):
        row = jnp.asarray(
            base + rng.normal(0, sigma, dim).astype(np.float32)
        )
        es_e = update_early_stop(es_e, row, i, patience=4)
        es_i = update_early_stop(es_i, row, i, patience=4)
        if i >= size - 1:
            exact_scores.append(float(es_e.best_score))
            inc_scores.append(float(es_i.best_score))
        assert bool(es_e.stop) == bool(es_i.stop)
    assert 1e-8 < exact_scores[-1] < 1e-6  # the targeted regime
    np.testing.assert_allclose(inc_scores, exact_scores, rtol=0.02)
    assert int(es_i.best_iter) == int(es_e.best_iter)


def test_early_stop_incremental_fires_in_fit():
    """es_mode='incremental' wired through make_dip_fit: the early stop
    still fires on a flat-variance run, and the fit still learns."""
    rng = np.random.default_rng(5)
    target = jnp.asarray(rng.random((1, 16, 16, 4)).astype(np.float32))
    mask = jnp.ones((1, 16, 16, 1), jnp.float32)
    inp = jnp.asarray(rng.random((1, 16, 16, 4)).astype(np.float32))
    cfg = DipConfig(num_iter=300, learning_rate=0.05, buffer_size=10,
                    patience=15, es_mode="incremental")
    res = jax.jit(make_dip_fit(_tiny_net(4), cfg))(
        jax.random.PRNGKey(0), inp, target, mask
    )
    assert bool(res.stopped) and int(res.n_iters) < 300
    assert float(res.loss) < 0.05


def test_dip_es_mode_validated():
    import pytest

    with pytest.raises(ValueError, match="es_mode"):
        make_dip_fit(_tiny_net(4), DipConfig(es_mode="fast"))


def test_dip_fit_learns_and_stops():
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((1, 16, 16, 4)).astype(np.float32))
    mask = jnp.asarray((rng.random((1, 16, 16, 1)) > 0.2).astype(np.float32))
    inp = jnp.asarray(rng.random((1, 16, 16, 4)).astype(np.float32))
    # long-patience run: must actually fit the target
    cfg = DipConfig(num_iter=300, learning_rate=0.05, buffer_size=10, patience=1000)
    fit_fn = jax.jit(make_dip_fit(_tiny_net(4), cfg))
    res = fit_fn(jax.random.PRNGKey(0), inp, target, mask)
    assert float(res.loss) < 0.02  # masked MSE must drop
    assert int(res.n_iters) == 300 and not bool(res.stopped)
    assert res.out.shape == target.shape
    # short-patience run: the windowed-variance early stop must fire
    cfg2 = DipConfig(num_iter=300, learning_rate=0.05, buffer_size=10, patience=15)
    res2 = jax.jit(make_dip_fit(_tiny_net(4), cfg2))(
        jax.random.PRNGKey(0), inp, target, mask
    )
    assert bool(res2.stopped) and int(res2.n_iters) < 300


def test_dip_fresh_init_differs():
    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.random((1, 16, 16, 4)).astype(np.float32))
    mask = jnp.ones((1, 16, 16, 1), jnp.float32)
    inp = jnp.asarray(rng.random((1, 16, 16, 4)).astype(np.float32))
    cfg = DipConfig(num_iter=5, buffer_size=3, patience=100)
    fit_fn = jax.jit(make_dip_fit(_tiny_net(4), cfg))
    r1 = fit_fn(jax.random.PRNGKey(0), inp, target, mask)
    r2 = fit_fn(jax.random.PRNGKey(1), inp, target, mask)
    assert not np.allclose(np.asarray(r1.out), np.asarray(r2.out))


def test_dip_fit_bfloat16_mixed_precision():
    rng = np.random.default_rng(3)
    target = jnp.asarray(rng.random((1, 16, 16, 4)).astype(np.float32))
    mask = jnp.ones((1, 16, 16, 1), jnp.float32)
    inp = jnp.asarray(rng.random((1, 16, 16, 4)).astype(np.float32))
    cfg = DipConfig(num_iter=150, learning_rate=0.05, buffer_size=10,
                    patience=1000, compute_dtype="bfloat16")
    res = jax.jit(make_dip_fit(_tiny_net(4), cfg))(
        jax.random.PRNGKey(0), inp, target, mask
    )
    assert res.out.dtype == jnp.float32
    assert float(res.loss) < 0.03  # bf16 still fits the target


def test_standalone_fit_lbfgs():
    rng = np.random.default_rng(4)
    target = jnp.asarray(rng.random((1, 16, 16, 2)).astype(np.float32))
    inp = jnp.asarray(rng.random((1, 16, 16, 2)).astype(np.float32))
    res = fit(
        _tiny_net(2),
        jax.random.PRNGKey(0),
        inp,
        target,
        config=FitConfig(num_iter=25, optimizer="lbfgs", find_best=False),
    )
    assert float(res.losses[-1]) < float(res.losses[0])


def test_standalone_fit_find_best():
    rng = np.random.default_rng(2)
    target = jnp.asarray(rng.random((1, 16, 16, 2)).astype(np.float32))
    inp = jnp.asarray(rng.random((1, 16, 16, 2)).astype(np.float32))
    res = fit(
        _tiny_net(2),
        jax.random.PRNGKey(0),
        inp,
        target,
        config=FitConfig(num_iter=60, lr=0.03, reg_noise_std=0.01,
                         lr_decay_epoch=20, find_best=True),
    )
    assert res.losses.shape == (60,)
    assert float(res.losses[-1]) < float(res.losses[0])
    assert res.out.shape == target.shape


def test_find_best_requires_improvement():
    """Reference include/fit.py:133 takes a snapshot only on a >=0.5%
    improvement — a loss merely within 1% of the best must NOT overwrite
    the stored best params (round-1 bug: ``loss < best*1.01`` accepted
    regressions)."""
    from lrs_pnp_dip_tpu.solvers.fit import find_best_update

    best_loss = jnp.asarray(jnp.inf)
    best_params = {"w": jnp.asarray(-1.0)}
    # (loss, params-tag) sequence: 0.999 and 0.502 are close-but-worse and
    # must be rejected; 1.0, 0.5, 0.4 are real improvements.
    seq = [(1.0, 0.0), (0.999, 1.0), (0.5, 2.0), (0.502, 3.0), (0.4, 4.0)]
    kept = []
    for loss, tag in seq:
        best_loss, best_params = find_best_update(
            jnp.asarray(loss), best_loss, best_params, {"w": jnp.asarray(tag)}
        )
        kept.append(float(best_params["w"]))
    assert kept == [0.0, 0.0, 2.0, 2.0, 4.0]
    assert abs(float(best_loss) - 0.4) < 1e-6


def test_fit_best_params_not_worse_than_min_loss():
    """End-to-end: the loss at the returned best_params may exceed the
    minimum recorded loss by at most the 0.5% snapshot threshold."""
    rng = np.random.default_rng(7)
    target = jnp.asarray(rng.random((1, 16, 16, 2)).astype(np.float32))
    inp = jnp.asarray(rng.random((1, 16, 16, 2)).astype(np.float32))
    model = _tiny_net(2)
    res = fit(
        model,
        jax.random.PRNGKey(0),
        inp,
        target,
        config=FitConfig(num_iter=60, lr=0.05, find_best=True),
    )
    out_best = model.apply({"params": res.best_params}, inp)
    loss_best = float(jnp.mean((out_best - target) ** 2))
    assert loss_best <= 1.005 * float(res.losses.min()) + 1e-7


def test_dip_return_mode_validated():
    import pytest

    from lrs_pnp_dip_tpu.solvers.dip import make_dip_fit

    with pytest.raises(ValueError, match="return_mode"):
        make_dip_fit(_tiny_net(4), DipConfig(return_mode="window-mean"))


def test_dip_window_mean_return_mode():
    """return_mode='window_mean' returns the mean of the ES ring buffer —
    including correct rescaling when the buffer never filled."""
    rng = np.random.default_rng(3)
    target = jnp.asarray(rng.random((1, 16, 16, 4)).astype(np.float32))
    mask = jnp.ones((1, 16, 16, 1), jnp.float32)
    inp = jnp.asarray(rng.random((1, 16, 16, 4)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    # buffer larger than the run: mean must still be over seen outputs only
    cfg = DipConfig(num_iter=8, learning_rate=0.05, buffer_size=32,
                    patience=1000, return_mode="window_mean")
    res = jax.jit(make_dip_fit(_tiny_net(4), cfg))(key, inp, target, mask)
    cfg_last = DipConfig(num_iter=8, learning_rate=0.05, buffer_size=32,
                         patience=1000, return_mode="last")
    res_last = jax.jit(make_dip_fit(_tiny_net(4), cfg_last))(key, inp, target, mask)
    assert res.out.shape == target.shape
    assert np.isfinite(np.asarray(res.out)).all()
    # the window mean of 8 outputs differs from the last output alone,
    # and sits in the convex hull scale-wise (no buffer_size/n_seen blowup)
    assert not np.allclose(np.asarray(res.out), np.asarray(res_last.out))
    assert float(jnp.abs(res.out).max()) <= float(
        1.5 * jnp.abs(res_last.out).max() + 1.0
    )

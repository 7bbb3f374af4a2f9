"""Windowed-variance DIP early stopping as a jit-compatible state machine.

Reference semantics (``main_LRS_PnP_DIP_pro.py:74-107,250-272``): keep a
sliding window of the last ``size`` (=30) network outputs, checked every
``show_every`` (=1) iterations; once the window is full compute the mean
image and the mean squared deviation of each window entry from it
(``myMetric``), average those — the "variance".  Track the best variance
seen; if it fails to improve ``patience`` (=60) consecutive checks, stop.

Here the window is a ring buffer carried in the ``lax.while_loop`` state;
the mean-of-mean-squared-deviations collapses to one fused reduction
``mean((window - window.mean(0))^2)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class EarlyStopState(NamedTuple):
    window: jnp.ndarray  # (size, D) ring buffer of flattened outputs
    count: jnp.ndarray  # total pushes so far (i32)
    best_score: jnp.ndarray  # best (lowest) variance seen (f32)
    best_iter: jnp.ndarray  # iteration of the best variance (i32)
    wait: jnp.ndarray  # consecutive non-improving checks (i32)
    stop: jnp.ndarray  # bool


def init_early_stop(size: int, dim: int) -> EarlyStopState:
    return EarlyStopState(
        window=jnp.zeros((size, dim), jnp.float32),
        count=jnp.zeros((), jnp.int32),
        best_score=jnp.asarray(jnp.inf, jnp.float32),
        best_iter=jnp.zeros((), jnp.int32),
        wait=jnp.zeros((), jnp.int32),
        stop=jnp.zeros((), bool),
    )


def update_early_stop(
    es: EarlyStopState, out_flat: jnp.ndarray, cur_iter, patience: int
) -> EarlyStopState:
    size = es.window.shape[0]
    idx = es.count % size
    window = es.window.at[idx].set(out_flat)
    count = es.count + 1
    filled = count >= size

    ave = jnp.mean(window, axis=0)
    var = jnp.mean((window - ave[None, :]) ** 2)

    improved = var < es.best_score
    best_score = jnp.where(filled & improved, var, es.best_score)
    best_iter = jnp.where(filled & improved, cur_iter, es.best_iter)
    wait = jnp.where(filled, jnp.where(improved, 0, es.wait + 1), es.wait)
    stop = es.stop | (filled & (wait >= patience))
    return EarlyStopState(window, count, best_score, best_iter, wait, stop)

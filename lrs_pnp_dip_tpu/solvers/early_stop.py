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

Two variance evaluators:

* ``exact`` (default) — recompute the fused reduction over the whole
  (size, D) window every check.  Bit-faithful to the reference order of
  operations, but at flagship scale the window is ~20 MB (30 x 36*36*128
  f32), too big for VMEM, so every DIP iteration streams it from HBM
  twice (mean pass + deviation pass) — measured as most of the
  while_loop-vs-scan overhead in ``bench.py``.
* ``incremental`` — carry per-pixel sufficient statistics
  ``S1_j = sum_i (w_ij - c_j)`` and ``S2_j = sum_i (w_ij - c_j)^2``
  about a per-pixel SHIFTED ORIGIN ``c_j``, updated O(D) per push (add
  the new row, subtract the evicted one), and evaluate
  ``var = mean_j(S2_j/n - (S1_j/n)^2)`` — the same quantity by the
  Koenig-Huygens identity (shift-invariant).  The origin matters:
  accumulating about zero suffers f32 catastrophic cancellation when
  ``var << mean^2`` (absolute error ~eps*mean^2 per pixel — exactly the
  well-converged plateau where the stop decision is made).  ``c_j`` is
  set to the current per-pixel window mean at every exact resync, so
  between resyncs both statistics stay at the scale of the variance
  itself.  To bound f32 running-sum drift the statistics (and the
  origin) are recomputed exactly from the ring buffer every ``size``
  pushes.  ~8x less HBM traffic per check; the stop DECISION can differ
  from 'exact' only when the variance gap between iterations is at f32
  rounding scale (pinned in ``tests/test_dip.py``, including a
  var~1e-7 / mean~1 cancellation-regime case).

  vmap caveat (SeedEnsembleSolver / tiled batches): the resync
  ``lax.cond`` has a batched predicate under vmap, so XLA lowers it to
  executing BOTH branches every check — the full (size, D) window
  reduction then runs every iteration and the HBM saving largely
  disappears in vmapped fits (correctness unaffected).  See
  docs/DESIGN.md "Early-stop variance evaluators".
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EarlyStopState(NamedTuple):
    window: jnp.ndarray  # (size, D) ring buffer of flattened outputs
    count: jnp.ndarray  # total pushes so far (i32)
    best_score: jnp.ndarray  # best (lowest) variance seen (f32)
    best_iter: jnp.ndarray  # iteration of the best variance (i32)
    wait: jnp.ndarray  # consecutive non-improving checks (i32)
    stop: jnp.ndarray  # bool
    sum: jnp.ndarray  # (D,) running per-pixel sum of (w - origin)
    #                    (incremental mode; shape (0,) when unused)
    sumsq: jnp.ndarray  # (D,) running per-pixel sum of (w - origin)^2
    origin: jnp.ndarray  # (D,) per-pixel shifted origin c (cancellation
    #                       control; refreshed to the window mean at resync)


def init_early_stop(size: int, dim: int, incremental: bool = False) -> EarlyStopState:
    stat_dim = dim if incremental else 0
    return EarlyStopState(
        window=jnp.zeros((size, dim), jnp.float32),
        count=jnp.zeros((), jnp.int32),
        best_score=jnp.asarray(jnp.inf, jnp.float32),
        best_iter=jnp.zeros((), jnp.int32),
        wait=jnp.zeros((), jnp.int32),
        stop=jnp.zeros((), bool),
        sum=jnp.zeros((stat_dim,), jnp.float32),
        sumsq=jnp.zeros((stat_dim,), jnp.float32),
        origin=jnp.zeros((stat_dim,), jnp.float32),
    )


def update_early_stop(
    es: EarlyStopState, out_flat: jnp.ndarray, cur_iter, patience: int
) -> EarlyStopState:
    size = es.window.shape[0]
    incremental = es.sum.shape[0] > 0
    idx = es.count % size
    evicted = es.window[idx] if incremental else None
    window = es.window.at[idx].set(out_flat)
    count = es.count + 1
    filled = count >= size

    if incremental:
        # O(D) update about the carried origin c: the S1 increment is
        # origin-independent ((w_new - c) - (w_old - c)); S2 must use the
        # SAME origin the running sums were accumulated under.
        c = es.origin
        s1 = es.sum + (out_flat - evicted)
        s2 = es.sumsq + ((out_flat - c) ** 2 - (evicted - c) ** 2)
        # drift + cancellation control: exact resync from the ring buffer
        # every `size` pushes, refreshing the origin to the current window
        # mean so both statistics stay at variance scale (amortizes to one
        # extra window pass per window period; under vmap the batched
        # predicate makes XLA run both branches — see module docstring)
        def resync(w, *_):
            c_new = jnp.mean(w, axis=0)
            d = w - c_new[None, :]
            return jnp.sum(d, axis=0), jnp.sum(d * d, axis=0), c_new

        s1, s2, c = jax.lax.cond(
            count % size == 0,
            resync,
            lambda w, a, b, cc: (a, b, cc),
            window, s1, s2, c,
        )
        n = jnp.float32(size)
        ave = s1 / n
        var = jnp.mean(jnp.maximum(s2 / n - ave * ave, 0.0))
    else:
        s1, s2, c = es.sum, es.sumsq, es.origin
        ave = jnp.mean(window, axis=0)
        var = jnp.mean((window - ave[None, :]) ** 2)

    improved = var < es.best_score
    best_score = jnp.where(filled & improved, var, es.best_score)
    best_iter = jnp.where(filled & improved, cur_iter, es.best_iter)
    wait = jnp.where(filled, jnp.where(improved, 0, es.wait + 1), es.wait)
    stop = es.stop | (filled & (wait >= patience))
    return EarlyStopState(
        window, count, best_score, best_iter, wait, stop, s1, s2, c
    )

"""Batched recovery: many (image, mask) problems advancing in lockstep.

The reference processes its 5 images x 4 masks by manually editing paths
and re-running scripts (``main_LRS_PnP.py:170-183``).  Here the whole
outer ADMM step — including each problem's fresh-net DIP training loop —
is ``vmap``-ped over a leading sample axis, so one compiled step advances
every problem at once; per-sample DIP early stopping is handled by the
``while_loop``-under-``vmap`` lowering (finished lanes idle until the
slowest lane stops).  On a mesh, the sample axis shards over ``data``
(see :mod:`..parallel`).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.io import HsiSample
from ..utils.config import SolverConfig
from .admm import ProblemConsts, SolverState, build_step, init_state, make_consts


def stack_consts(consts: Sequence[ProblemConsts]) -> ProblemConsts:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *consts)


def stack_states(states: Sequence[SolverState]) -> SolverState:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


class BatchedSolver:
    """Solve N same-shaped problems in one vmapped engine."""

    def __init__(
        self,
        samples: Sequence[HsiSample],
        dictionary: np.ndarray,
        config: SolverConfig,
        net=None,
        jit_step: bool = True,
    ):
        shapes = {s.shape for s in samples}
        if len(shapes) != 1:
            raise ValueError(f"all samples must share a shape, got {shapes}")
        self.samples = list(samples)
        self.config = config
        self.shape = self.samples[0].shape
        self.consts = stack_consts(
            [make_consts(s, dictionary, config) for s in samples]
        )
        step = build_step(config, self.shape, net=net)
        vstep = jax.vmap(step, in_axes=(0, 0))
        self._step = jax.jit(vstep) if jit_step else vstep

    def init_state(self, seed: Optional[int] = None) -> SolverState:
        seed = self.config.seed if seed is None else seed
        return stack_states(
            [init_state(s, seed + i) for i, s in enumerate(self.samples)]
        )

    def step(self, state: SolverState):
        return self._step(state, self.consts)

    def run(self, n_iters: Optional[int] = None, state=None, callback=None):
        n = self.config.outer_iters if n_iters is None else n_iters
        state = self.init_state() if state is None else state
        hist = {k: [] for k in ("mpsnr", "ssim", "dip_iters")}
        for i in range(n):
            state, aux = self.step(state)
            for k in hist:
                hist[k].append(np.asarray(getattr(aux, k)))
            if callback is not None:
                callback(i, state, aux)
        for k in list(hist):
            hist[k] = np.stack(hist[k])  # (n_iters, n_samples)
        return state, hist

    def result_cubes(self, state: SolverState) -> np.ndarray:
        h, w, b = self.shape
        return np.asarray(state.X).reshape(-1, h, w, b)


class SeedEnsembleSolver:
    """Solve ONE problem under N independent PRNG seeds in lockstep.

    The algorithm is stochastic (a fresh DIP net is initialised every outer
    iteration, reference ``main_LRS_PnP_DIP_pro.py:215-221``), so
    production recovery wants the seed spread — mean/max best-MPSNR, or an
    ensemble-averaged cube — not a single draw.  The round-4 seed-variance
    study (RESULTS.md) ran 8 seeds x 250 iterations sequentially; this
    engine vmaps the same pure step over the seed axis with the problem
    constants SHARED (``in_axes=(0, None)``) — one compiled step advances
    every seed, and the consts (dictionary, target, masks) are kept once,
    not N times.

    The reference has no equivalent (one hand-picked run per figure).
    """

    def __init__(
        self,
        sample: HsiSample,
        dictionary: np.ndarray,
        config: SolverConfig,
        seeds: Sequence[int],
        net=None,
        jit_step: bool = True,
    ):
        if not seeds:
            raise ValueError("need at least one seed")
        self.sample = sample
        self.config = config
        self.seeds = list(seeds)
        self.shape = sample.shape
        self.consts = make_consts(sample, dictionary, config)
        step = build_step(config, self.shape, net=net)
        vstep = jax.vmap(step, in_axes=(0, None))
        self._step = jax.jit(vstep) if jit_step else vstep

    def init_state(self) -> SolverState:
        return stack_states([init_state(self.sample, s) for s in self.seeds])

    def step(self, state: SolverState):
        return self._step(state, self.consts)

    def run(self, n_iters: Optional[int] = None, state=None):
        """Host-stepped loop; returns (final_state, hist) with per-seed
        arrays of shape (n_iters, n_seeds) plus the ensemble-mean cube's
        ``ens_mpsnr``/``ens_ssim`` trajectory (n_iters,).  Compiles only
        the single vmapped step — the large-program fallback when a
        scan-over-everything executable is too big for the backend."""
        from ..ops.metrics import mpsnr as _mpsnr
        from ..ops.ssim import ssim as _ssim

        h, w, b = self.shape

        if not hasattr(self, "_ens_metrics"):
            def ens_metrics(st, consts):
                mean_cube = jnp.mean(st.X, axis=0).reshape(h, w, b)
                return (_mpsnr(consts.clean, mean_cube),
                        _ssim(consts.clean, mean_cube))

            self._ens_metrics = jax.jit(ens_metrics)

        n = self.config.outer_iters if n_iters is None else n_iters
        state = self.init_state() if state is None else state
        hist = {k: [] for k in ("mpsnr", "ssim", "dip_iters",
                                "ens_mpsnr", "ens_ssim")}
        for _ in range(n):
            state, aux = self.step(state)
            em, es = self._ens_metrics(state, self.consts)
            for k in ("mpsnr", "ssim", "dip_iters"):
                hist[k].append(np.asarray(getattr(aux, k)))
            hist["ens_mpsnr"].append(np.asarray(em))
            hist["ens_ssim"].append(np.asarray(es))
        return state, {k: np.stack(v) for k, v in hist.items()}

    def _scan_all(self):
        """The jitted ``(state, consts, length) -> (state, hist)`` scan of
        the vmapped step with the ensemble-mean metrics computed INSIDE the
        body (one executable per static ``length``, cached by jit)."""
        if not hasattr(self, "_scan_all_fn"):
            import functools

            from ..ops.metrics import mpsnr as _mpsnr
            from ..ops.ssim import ssim as _ssim

            _step = self._step
            h, w, b = self.shape

            def body(st, _, consts):
                new_st, aux = _step(st, consts)
                mean_cube = jnp.mean(new_st.X, axis=0).reshape(h, w, b)
                return new_st, {
                    "mpsnr": aux.mpsnr,
                    "ssim": aux.ssim,
                    "dip_iters": aux.dip_iters,
                    "ens_mpsnr": _mpsnr(consts.clean, mean_cube),
                    "ens_ssim": _ssim(consts.clean, mean_cube),
                }

            @functools.partial(jax.jit, static_argnames=("length",))
            def scan_all(st, consts, length):
                return jax.lax.scan(
                    functools.partial(body, consts=consts), st, None,
                    length=length,
                )

            self._scan_all_fn = scan_all
        return self._scan_all_fn

    def run_scanned(self, n_iters: Optional[int] = None, state=None):
        """All iterations for all seeds as ONE on-device ``lax.scan``.

        Besides the per-seed scalars, records ``ens_mpsnr``/``ens_ssim`` —
        the quality of the ENSEMBLE-MEAN cube (mean of the N seed iterates)
        at every iteration.  Averaging independent DIP draws cancels
        per-draw noise the same way the window-mean return does within one
        run; the best-iteration ensemble mean is the engine's headline
        estimator.

        CAUTION: at production scale (8 seeds x 250 iterations of the
        flagship DIP step) this program crashes the remote TPU compiler
        (CLAUDE.md, commit b32ecc5) — use :meth:`run_chunked` there."""
        n = self.config.outer_iters if n_iters is None else n_iters
        state = self.init_state() if state is None else state
        final, hist = self._scan_all()(state, self.consts, n)
        return final, {k: np.asarray(v) for k, v in hist.items()}

    def run_chunked(
        self, n_iters: Optional[int] = None, state=None, chunk: int = 25
    ):
        """Chunked middle ground (VERDICT r4 #4): ``chunk`` outer
        iterations per dispatch as one ``lax.scan`` with the ensemble
        metrics folded into the body.

        Program size stays ~``n/chunk``-times below the all-at-once scan
        that crashes the remote compiler at ensemble scale, while host
        round-trips drop ~``chunk``-fold vs :meth:`run` (which also pays a
        SECOND dispatch per iteration for the ensemble metrics).  One
        executable serves every full chunk; a final partial chunk compiles
        once more at its remainder length."""
        if chunk < 1:
            raise ValueError(f"chunk must be >= 1, got {chunk}")
        n = self.config.outer_iters if n_iters is None else n_iters
        state = self.init_state() if state is None else state
        scan_all = self._scan_all()
        hists = []
        done = 0
        while done < n:
            length = min(chunk, n - done)
            state, hist = scan_all(state, self.consts, length)
            hists.append(hist)
            done += length
        merged = {
            k: np.concatenate([np.asarray(h[k]) for h in hists], axis=0)
            for k in hists[0]
        }
        return state, merged

    def spread(self, hist) -> dict:
        """Per-seed best MPSNR + aggregate stats from a run's history."""
        best = np.nanmax(np.asarray(hist["mpsnr"]), axis=0)  # (n_seeds,)
        return {
            "per_seed_best": best.tolist(),
            "mean": float(np.mean(best)),
            "std": float(np.std(best)),
            "min": float(np.min(best)),
            "max": float(np.max(best)),
        }

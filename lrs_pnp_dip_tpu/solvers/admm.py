"""The ADMM-style outer solver engine — the heart of the framework.

Reference call stack being re-designed (SURVEY §3.1; loop bodies at
``main_LRS_PnP_DIP_pro.py:355-528``, ``main_LRS_PnP.py:250-366``,
``main_LRS_PnP_DIP_1-LiP.py:347-520``): per outer iteration

  1. sparse prox:   blocks(X + l1/mu1) -> per-block PnP-ISTA -> Phi_z
  2. low-rank prox: U = SVT(X + l2/mu2, 1/mu2)            (lrs_pnp)
                    U = DIP-train(target=noisy, input=X + l2/mu2)  (dip*)
  3. closed-form X update (mask-aware data fidelity)
  4. dual updates l1 += mu1(X - IMout), l2 += mu2(X - U)
  5. convergence distances log||state - prev||

TPU-first shape: the entire outer step — including the DIP training
``while_loop`` — is ONE jit-compiled pure function
``step(SolverState) -> (SolverState, StepAux)``; the Python loop around it
only orchestrates logging/checkpointing.  The DIP network is freshly
initialised inside the step from a split of the carried PRNG key, so one
compilation serves all 250 outer iterations.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..data.io import HsiSample, matricize
from ..models import LipschitzUNet, dip_skip_128
from ..ops.blocks import block_grid, extract_blocks
from ..ops.fidelity import data_fidelity_update, dual_updates
from ..ops.ista import sparse_prox
from ..ops.metrics import mpsnr
from ..ops.ssim import ssim
from ..ops.svt import svt_gram
from ..utils.config import SolverConfig
from .dip import DipResult, make_dip_fit


class SolverState(NamedTuple):
    """Carried ADMM state (a pytree; shards cleanly over a mesh)."""

    X: jnp.ndarray  # (P, B) current estimate
    lambda1: jnp.ndarray  # (P, B) sparsity dual
    lambda2: jnp.ndarray  # (P, B) low-rank dual
    key: jnp.ndarray  # PRNG key (drives fresh DIP init per step)
    itr: jnp.ndarray  # outer iteration counter


class StepAux(NamedTuple):
    """Per-iteration diagnostics (reference's printed/tracked values)."""

    mpsnr: jnp.ndarray  # vs clean (NaN when no ground truth)
    ssim: jnp.ndarray
    x_dist: jnp.ndarray  # log||X - X_prev||
    l1_dist: jnp.ndarray
    l2_dist: jnp.ndarray
    dip_iters: jnp.ndarray  # DIP iterations run (0 for lrs_pnp)
    dip_loss: jnp.ndarray
    U: jnp.ndarray  # low-rank/DIP prox output (for viz parity)
    phi_scatter: jnp.ndarray  # sparse-prox image (for viz parity)


def _log_dist(a, b):
    return jnp.log(jnp.linalg.norm(a - b))


class Solver:
    """LRS-PnP / LRS-PnP-DIP / LRS-PnP-DIP(1-Lip) engine for one problem.

    Builds all static data (block grid, observed-block mask, dictionary)
    once, compiles one outer step, and exposes ``init_state`` / ``step`` /
    ``run``.
    """

    def __init__(
        self,
        sample: HsiSample,
        dictionary: np.ndarray,
        config: SolverConfig,
        jit_step: bool = True,
        net=None,
    ):
        self.sample = sample
        self.config = config
        h, w, b = sample.shape
        self.height, self.width, self.n_bands = h, w, b

        Y = jnp.asarray(matricize(sample.noisy), jnp.float32)  # (P, B)
        mask2d = jnp.asarray(
            np.repeat(matricize(sample.mask[..., None]), b, axis=1), jnp.float32
        )
        self.Y = Y
        self.mask2d = mask2d
        self.D = jnp.asarray(dictionary, jnp.float32)
        self.grid = block_grid((h * w, b), config.block_size, config.stride)
        # Missing entries located once from the *observed* blocks
        # (reference ``blocks_copy``, ``main_LRS_PnP_DIP_pro.py:347``).
        obs_blocks = extract_blocks(Y, self.grid)
        self.mask_blocks = (obs_blocks != 0).astype(jnp.float32)
        self.clean_cube = (
            jnp.asarray(sample.clean, jnp.float32) if sample.clean is not None else None
        )
        # DIP pieces
        self._dip_fit = None
        if config.variant in ("dip", "dip_1lip"):
            if net is None:
                if config.variant == "dip":
                    net = dip_skip_128(num_channels=b)
                else:
                    net = LipschitzUNet(
                        num_output_channels=b,
                        width=config.net_width,
                        ln_lambda=config.ln_lambda,
                        sn_mode=config.sn_mode,
                    )
            self.net = net
            self._dip_fit = make_dip_fit(net, config.dip)
            # fixed DIP target: the noisy observation as (1, H, W, B)
            self.dip_target = jnp.asarray(sample.noisy, jnp.float32)[None]
            self.dip_mask = jnp.asarray(sample.mask, jnp.float32)[None, :, :, None]
        elif config.variant != "lrs_pnp":
            raise ValueError(f"unknown variant {config.variant!r}")

        step = self._build_step()
        self._step = jax.jit(step) if jit_step else step

    # ------------------------------------------------------------------
    def init_state(self, seed: Optional[int] = None) -> SolverState:
        key = jax.random.PRNGKey(self.config.seed if seed is None else seed)
        return SolverState(
            X=self.Y,
            lambda1=jnp.zeros_like(self.Y),
            lambda2=jnp.zeros_like(self.Y),
            key=key,
            itr=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def _u_update(self, X, lambda2, key):
        """The low-rank prox: SVT or a fresh DIP training run."""
        cfg = self.config
        Z = X + lambda2 / cfg.mu2
        if cfg.variant == "lrs_pnp":
            U = svt_gram(Z, 1.0 / cfg.mu2)
            return U, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32)
        # image-conditioned DIP: input is the ADMM iterate as (1, H, W, B)
        dip_input = Z.reshape(1, self.height, self.width, self.n_bands)
        res: DipResult = self._dip_fit(key, dip_input, self.dip_target, self.dip_mask)
        U = res.out.reshape(self.height * self.width, self.n_bands)
        return U, res.n_iters, res.loss

    def _build_step(self) -> Callable[[SolverState], tuple]:
        cfg = self.config
        grid = self.grid

        def step(state: SolverState):
            key, dip_key = jax.random.split(state.key)
            # 1. sparse-coding prox over blocks
            blocks = extract_blocks(state.X + state.lambda1 / cfg.mu1, grid)
            phi = sparse_prox(blocks, self.mask_blocks, self.D, cfg.sparse)
            # 2. low-rank / DIP prox
            U, dip_iters, dip_loss = self._u_update(state.X, state.lambda2, dip_key)
            # 3. closed-form X
            X, im_out = data_fidelity_update(
                self.Y, self.mask2d, phi, U, state.lambda1, state.lambda2,
                grid, cfg.gamma, cfg.mu1, cfg.mu2,
            )
            # 4. duals
            l1, l2 = dual_updates(
                state.lambda1, state.lambda2, X, im_out, U, cfg.mu1, cfg.mu2
            )
            # 5. diagnostics
            cube = X.reshape(self.height, self.width, self.n_bands)
            if self.clean_cube is not None:
                m = mpsnr(self.clean_cube, cube)
                s = ssim(self.clean_cube, cube)
            else:
                m = jnp.asarray(jnp.nan)
                s = jnp.asarray(jnp.nan)
            from ..ops.blocks import scatter_blocks

            aux = StepAux(
                mpsnr=m,
                ssim=s,
                x_dist=_log_dist(X, state.X),
                l1_dist=_log_dist(l1, state.lambda1),
                l2_dist=_log_dist(l2, state.lambda2),
                dip_iters=dip_iters,
                dip_loss=dip_loss,
                U=U,
                phi_scatter=scatter_blocks(phi, grid) / grid.weight(),
            )
            new_state = SolverState(X=X, lambda1=l1, lambda2=l2, key=key, itr=state.itr + 1)
            return new_state, aux

        return step

    # ------------------------------------------------------------------
    def step(self, state: SolverState):
        return self._step(state)

    def run(
        self,
        n_iters: Optional[int] = None,
        state: Optional[SolverState] = None,
        callback: Optional[Callable[[int, SolverState, StepAux], None]] = None,
    ):
        """Run the outer loop; returns (final_state, history dict)."""
        n = self.config.outer_iters if n_iters is None else n_iters
        state = self.init_state() if state is None else state
        hist = {k: [] for k in ("mpsnr", "ssim", "x_dist", "l1_dist", "l2_dist", "dip_iters")}
        best = (-np.inf, None)
        for i in range(n):
            state, aux = self.step(state)
            for k in hist:
                hist[k].append(float(getattr(aux, k)))
            if hist["mpsnr"][-1] > best[0]:
                best = (hist["mpsnr"][-1], np.asarray(state.X))
            if callback is not None:
                callback(i, state, aux)
        hist["best_mpsnr"] = best[0]
        hist["best_X"] = best[1]
        return state, hist

    # ------------------------------------------------------------------
    def result_cube(self, state: SolverState) -> np.ndarray:
        return np.asarray(state.X).reshape(self.height, self.width, self.n_bands)


def solve(
    sample: HsiSample,
    dictionary: np.ndarray,
    config: SolverConfig,
    n_iters: Optional[int] = None,
    callback=None,
):
    """Convenience one-call solve. Returns (cube, history)."""
    solver = Solver(sample, dictionary, config)
    state, hist = solver.run(n_iters=n_iters, callback=callback)
    return solver.result_cube(state), hist

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
``while_loop`` — is ONE pure function ``step(SolverState, ProblemConsts)``
built once per (config, shapes) by :func:`build_step`.  The same function
is

  * jit-compiled directly for a single problem (:class:`Solver`),
  * ``vmap``-ped over a leading sample axis for the 5-image x 4-mask
    batched recovery (:mod:`.batch`),
  * jit-ted with mesh shardings for multi-chip runs (:mod:`..parallel`).

The DIP network is freshly initialised inside the step from a split of the
carried PRNG key, so one compilation serves all 250 outer iterations.
"""

from __future__ import annotations


from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.io import HsiSample, matricize
from ..models import LipschitzUNet, dip_skip_128
from ..ops.blocks import BlockGrid, block_grid, extract_blocks, scatter_blocks
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


class ProblemConsts(NamedTuple):
    """Per-problem constants threaded through the pure step function.

    ``clean`` may be a NaN cube when no ground truth exists (metrics then
    come out NaN, matching 'no eval possible')."""

    Y: jnp.ndarray  # (P, B) observed matricized image
    mask2d: jnp.ndarray  # (P, B) observation mask
    mask_blocks: jnp.ndarray  # (nB, bb*bb) observed-entry mask per block
    D: jnp.ndarray  # (bb*bb, K) dictionary
    clean: jnp.ndarray  # (H, W, B) ground truth (or NaN)
    dip_target: jnp.ndarray  # (1, H, W, B) fixed noisy target (DIP variants)
    dip_mask: jnp.ndarray  # (1, H, W, 1) observation mask for DIP loss
    alpha: jnp.ndarray  # (nB,) precomputed per-block ISTA step sizes —
    #   mask/dictionary constants (ops.ista.compute_alpha), hoisted out of
    #   the outer loop so the specnorm power iteration runs once per
    #   problem, not once per outer iteration


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


class SolverDiverged(RuntimeError):
    """Raised when the iterate goes non-finite (failure detection — the
    reference had none and would silently produce NaN figures)."""


def default_net(config: SolverConfig, n_bands: int):
    if config.dip_net != "default":
        from ..models import get_net

        return get_net(n_bands, config.dip_net, pad="reflection",
                       n_channels=n_bands)
    if config.variant == "dip":
        return dip_skip_128(num_channels=n_bands)
    if config.variant == "dip_1lip":
        return LipschitzUNet(
            num_output_channels=n_bands,
            width=config.net_width,
            ln_lambda=config.ln_lambda,
            sn_mode=config.sn_mode,
        )
    return None


def build_step(
    config: SolverConfig,
    image_shape: tuple,  # (H, W, B)
    net=None,
    svt_fn: Optional[Callable] = None,
    sparse_prox_fn: Optional[Callable] = None,
    dip_param_constraint: Optional[Callable] = None,
) -> Callable[[SolverState, ProblemConsts], tuple]:
    """Build the pure outer-step function for one problem geometry.

    ``svt_fn(Z, tau)`` and ``sparse_prox_fn(blocks, mask_blocks, D)`` may
    be overridden (e.g. with the distributed Gram-psum SVT / shard_map
    sparse prox from :mod:`..parallel.collectives`);
    ``dip_param_constraint`` places the fresh per-iteration DIP params on a
    mesh (tensor parallelism — ``parallel.tensor.make_channel_constraint``).
    """
    h, w, b = image_shape
    grid = block_grid((h * w, b), config.block_size, config.stride)
    cfg = config
    if cfg.variant in ("dip", "dip_1lip"):
        net = net or default_net(cfg, b)
        dip_fit = make_dip_fit(net, cfg.dip, param_constraint=dip_param_constraint)
    elif cfg.variant != "lrs_pnp":
        raise ValueError(f"unknown variant {cfg.variant!r}")
    svt_fn = svt_fn or svt_gram
    if sparse_prox_fn is None:
        sparse_prox_fn = lambda b, m, d, alpha=None: sparse_prox(
            b, m, d, cfg.sparse, alpha=alpha
        )

    def u_update(X, lambda2, key, consts: ProblemConsts):
        Z = X + lambda2 / cfg.mu2
        if cfg.variant == "lrs_pnp":
            U = svt_fn(Z, 1.0 / cfg.mu2)
            return U, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32)
        fit_key, input_key = jax.random.split(key)
        if cfg.dip.input_mode == "noise":
            dip_input = cfg.dip.noise_var * jax.random.uniform(
                input_key, (1, h, w, b)
            )
        else:
            dip_input = Z.reshape(1, h, w, b)
        res: DipResult = dip_fit(fit_key, dip_input, consts.dip_target, consts.dip_mask)
        return res.out.reshape(h * w, b), res.n_iters, res.loss

    def step(state: SolverState, consts: ProblemConsts):
        key, dip_key = jax.random.split(state.key)
        # 1. sparse-coding prox over blocks
        blocks = extract_blocks(state.X + state.lambda1 / cfg.mu1, grid)
        phi = sparse_prox_fn(blocks, consts.mask_blocks, consts.D, consts.alpha)
        # 2. low-rank / DIP prox
        U, dip_iters, dip_loss = u_update(state.X, state.lambda2, dip_key, consts)
        # 3. closed-form X
        X, im_out = data_fidelity_update(
            consts.Y, consts.mask2d, phi, U, state.lambda1, state.lambda2,
            grid, cfg.gamma, cfg.mu1, cfg.mu2,
        )
        # 4. duals
        l1, l2 = dual_updates(
            state.lambda1, state.lambda2, X, im_out, U, cfg.mu1, cfg.mu2
        )
        # 5. diagnostics
        cube = X.reshape(h, w, b)
        aux = StepAux(
            mpsnr=mpsnr(consts.clean, cube),
            ssim=ssim(consts.clean, cube),
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


def make_consts(
    sample: HsiSample, dictionary, config: SolverConfig
) -> ProblemConsts:
    """Assemble the per-problem constant pytree from a sample.

    Host->device transfers are minimised (the axon tunnel moves tens of
    MB/s, and the tiled engine calls this per tile): only ``noisy``
    (H,W,B), ``mask`` (H,W), ``clean`` and the dictionary are uploaded;
    ``Y``/``mask2d``/``mask_blocks``/``dip_target``/``alpha`` are derived
    ON DEVICE — the round-5 tiled bench measured the previous host-built
    uploads (3 extra ~10 MB arrays per 144² tile) dominating the warm
    whole-scene wall."""
    h, w, b = sample.shape
    noisy = jnp.asarray(sample.noisy, jnp.float32)  # (H, W, B) upload
    mask_hw = jnp.asarray(sample.mask, jnp.float32)  # (H, W) upload
    Y = noisy.reshape(h * w, b)  # matricize: row-major pixels
    mask2d = jnp.broadcast_to(mask_hw.reshape(h * w, 1), (h * w, b)).astype(
        jnp.float32
    )
    grid = block_grid((h * w, b), config.block_size, config.stride)
    obs_blocks = extract_blocks(Y, grid)
    # Missing entries located once from the *observed* blocks
    # (reference ``blocks_copy``, ``main_LRS_PnP_DIP_pro.py:347``).
    mask_blocks = (obs_blocks != 0).astype(jnp.float32)
    clean = (
        jnp.asarray(sample.clean, jnp.float32)
        if sample.clean is not None
        else jnp.full((h, w, b), jnp.nan, jnp.float32)
    )
    from ..ops.ista import compute_alpha

    D = jnp.asarray(dictionary, jnp.float32)
    return ProblemConsts(
        Y=Y,
        mask2d=mask2d,
        mask_blocks=mask_blocks,
        D=D,
        clean=clean,
        dip_target=noisy[None],
        dip_mask=mask_hw[None, :, :, None],
        alpha=compute_alpha(D, mask_blocks, config.sparse),
    )


def init_state(sample_or_Y, seed: int = 0) -> SolverState:
    """X starts at the observed image; duals at zero
    (reference ``main_LRS_PnP_DIP_pro.py:324-334``)."""
    if isinstance(sample_or_Y, HsiSample):
        Y = jnp.asarray(matricize(sample_or_Y.noisy), jnp.float32)
    else:
        Y = jnp.asarray(sample_or_Y, jnp.float32)
    return SolverState(
        X=Y,
        lambda1=jnp.zeros_like(Y),
        lambda2=jnp.zeros_like(Y),
        key=jax.random.PRNGKey(seed),
        itr=jnp.zeros((), jnp.int32),
    )


class Solver:
    """Single-problem LRS-PnP / LRS-PnP-DIP / LRS-PnP-DIP(1-Lip) engine."""

    def __init__(
        self,
        sample: HsiSample,
        dictionary: np.ndarray,
        config: SolverConfig,
        jit_step: bool = True,
        net=None,
        svt_fn: Optional[Callable] = None,
    ):
        self.sample = sample
        self.config = config
        self.height, self.width, self.n_bands = sample.shape
        self.consts = make_consts(sample, dictionary, config)
        step = build_step(config, sample.shape, net=net, svt_fn=svt_fn)
        self._step = jax.jit(step) if jit_step else step

    def init_state(self, seed: Optional[int] = None) -> SolverState:
        return init_state(
            self.sample, self.config.seed if seed is None else seed
        )

    def step(self, state: SolverState):
        return self._step(state, self.consts)

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
            # failure detection: x_dist is log||dX||.  NaN/+inf means the
            # iterate went non-finite somewhere in the step; -inf means
            # ||dX|| is exactly zero — a bit-identical (stalled) iterate,
            # which a stochastic step never produces in healthy operation
            # (fresh DIP init per iteration) and the deterministic variant
            # only produces at a degenerate fixed point (e.g. all-zero X).
            if not np.isfinite(hist["x_dist"][-1]):
                kind = (
                    "exactly-stalled (||dX|| == 0)"
                    if hist["x_dist"][-1] == -np.inf
                    else "non-finite"
                )
                raise SolverDiverged(
                    f"{kind} iterate at outer iteration {i} "
                    f"(variant={self.config.variant}); last finite MPSNR "
                    f"{best[0]:.3f} — checkpoint and inspect duals/step sizes"
                )
            if hist["mpsnr"][-1] > best[0]:
                best = (hist["mpsnr"][-1], np.asarray(state.X))
            if callback is not None:
                callback(i, state, aux)
        hist["best_mpsnr"] = best[0]
        hist["best_X"] = best[1]
        return state, hist

    def run_scanned(self, n_iters: Optional[int] = None, state: Optional[SolverState] = None):
        """Run N outer iterations as ONE on-device ``lax.scan`` — zero host
        round-trips between iterations (the dispatch-free production path).
        Returns (final_state, stacked scalar history dict)."""
        n = self.config.outer_iters if n_iters is None else n_iters
        state = self.init_state() if state is None else state
        if not hasattr(self, "_scan_fn"):
            _step = self._step

            def scan_body(st, _, consts):
                new_st, aux = _step(st, consts)
                scalars = {
                    "mpsnr": aux.mpsnr,
                    "ssim": aux.ssim,
                    "x_dist": aux.x_dist,
                    "l1_dist": aux.l1_dist,
                    "l2_dist": aux.l2_dist,
                    "dip_iters": aux.dip_iters,
                }
                return new_st, scalars

            import functools as _ft

            # consts is a traced ARGUMENT, not a closure capture: closed-over
            # arrays are baked into the HLO as literals, which bloats the
            # executable by the full problem size (a 576x576x128 cube's
            # consts are ~0.5 GB of literals — enough to break remote
            # compilation outright) and defeats donation/caching.
            @_ft.partial(jax.jit, static_argnames=("length",))
            def scan_all(st, consts, length):
                body = _ft.partial(scan_body, consts=consts)
                return jax.lax.scan(body, st, None, length=length)

            self._scan_fn = scan_all
        final, hist = self._scan_fn(state, self.consts, n)
        return final, {k: np.asarray(v) for k, v in hist.items()}

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

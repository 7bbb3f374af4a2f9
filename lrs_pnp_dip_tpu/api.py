"""One-call user API.

    import lrs_pnp_dip_tpu as lrs
    cube, info = lrs.inpaint(noisy, mask, variant="dip")

Handles dictionary acquisition automatically: the shipped artifact when the
patch geometry matches, otherwise a dictionary learned on the fly from the
observed data (masked entries excluded by using the observed pixels only).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from .data.io import HsiSample
from .utils.config import PRESETS, SolverConfig


def _auto_dictionary(sample: HsiSample, config: SolverConfig, n_atoms: int = 512):
    patch_dim = config.block_size * config.block_size
    if patch_dim == 36 * 36:
        try:
            from .data.dictionary import load_trained_dictionary

            return load_trained_dictionary(n_atoms)
        except FileNotFoundError:
            pass
    # learn from the observed image itself (self-supervised, like the
    # whole pipeline): use the noisy cube, which is all that exists.
    # Masked entries are excluded — fully-observed patches when enough
    # exist, otherwise mask-aware learning (holes carry zero weight), so
    # zero-filled holes never train into atoms.
    from .data.dictionary import extract_training_patches, learn_dictionary

    patches, mask_patches = extract_training_patches(
        [sample.noisy], block_size=config.block_size, stride=1,
        masks=[sample.mask],
    )
    fully_observed = mask_patches.min(axis=0) > 0
    n_full = int(fully_observed.sum())
    if n_full >= max(64, patches.shape[1] // 4):
        patches = patches[:, fully_observed]
        mask_patches = None
    n_atoms = min(n_atoms, max(64, patches.shape[1] // 2))
    return learn_dictionary(
        patches, n_atoms=n_atoms, n_outer=10, sparse_iters=20,
        mask_patches=mask_patches,
    )


def inpaint(
    noisy: np.ndarray,
    mask: np.ndarray,
    variant: str = "dip",
    clean: Optional[np.ndarray] = None,
    dictionary: Optional[np.ndarray] = None,
    config: Optional[SolverConfig] = None,
    n_iters: Optional[int] = None,
    seeds: Optional[Sequence[int]] = None,
    **preset_overrides,
) -> Tuple[np.ndarray, dict]:
    """Recover a masked+noisy (H, W, B) cube.  Returns (cube, history).

    ``seeds``: run a seed ENSEMBLE instead of a single solve — the DIP
    variants are stochastic (fresh net per outer iteration), and the
    ensemble-mean of N independent draws is a stronger estimator than any
    single run (see RESULTS.md).  The returned cube is the ensemble mean
    at the final iteration; ``history`` carries per-seed ``mpsnr``
    (n_iters, n_seeds) plus the ensemble trajectory ``ens_mpsnr``.
    """
    from .solvers import SeedEnsembleSolver, Solver

    sample = HsiSample(
        noisy=np.asarray(noisy, np.float32),
        mask=np.asarray(mask, np.float32),
        clean=None if clean is None else np.asarray(clean, np.float32),
    )
    cfg = config or PRESETS[variant](**preset_overrides)
    if dictionary is None:
        dictionary = _auto_dictionary(sample, cfg)
    if seeds is not None:
        ens = SeedEnsembleSolver(sample, dictionary, cfg, seeds)
        # chunked scan: remote-compiler-safe program size, ~25x fewer
        # host round-trips than the per-iteration loop (VERDICT r4 #4)
        state, hist = ens.run_chunked(n_iters)
        h, w, b = sample.shape
        cube = np.asarray(state.X).mean(axis=0).reshape(h, w, b)
        return cube, hist
    solver = Solver(sample, dictionary, cfg)
    state, hist = solver.run(n_iters=n_iters)
    return solver.result_cube(state), hist


def inpaint_scene(
    noisy: np.ndarray,
    mask: np.ndarray,
    variant: str = "lrs_pnp",
    dictionary: Optional[np.ndarray] = None,
    config: Optional[SolverConfig] = None,
    tile_shape: Tuple[int, int] = (36, 36),
    tile_batch: int = 8,
    overlap: int = 0,
    n_iters: Optional[int] = None,
    net=None,
    verbose: bool = False,
    scan: Optional[bool] = None,
    pad_final: bool = False,
    **preset_overrides,
) -> np.ndarray:
    """Recover an arbitrarily large (H, W, B) scene by tile streaming.

    The whole-scene counterpart of :func:`inpaint` — the reference can
    only ever process one hard-coded 36x36 crop per script run; this
    splits any scene into ``tile_shape`` tiles, solves ``tile_batch`` of
    them per compiled on-device scan (:func:`..solvers.tiled.solve_tiled`)
    and stitches with overlap averaging.  Dictionary handling matches
    :func:`inpaint` (shipped artifact when the patch geometry matches,
    otherwise learned from the observed data).  Returns the recovered
    (H, W, B) cube.

    ``scan``: ``None`` (default) picks the on-device scan for the
    deterministic ``lrs_pnp`` variant and the host-stepped loop for DIP
    variants — a scan-of-N of a ``tile_batch``-wide vmapped DIP step at
    production iteration counts is exactly the program shape measured to
    crash the remote TPU compiler (CLAUDE.md, round 4).  Pass
    ``scan=True``/``False`` to force either path; ``net``/``verbose``/
    ``pad_final`` forward to :func:`~.solvers.tiled.solve_tiled`.
    """
    from .solvers.tiled import solve_tiled

    noisy = np.asarray(noisy, np.float32)
    mask = np.asarray(mask, np.float32)
    cfg = config or PRESETS[variant](**preset_overrides)
    if dictionary is None:
        # learn from (a bounded central crop of) the scene itself; the
        # dictionary geometry is cfg.block_size, independent of tile size
        h, w = noisy.shape[:2]
        ch, cw = min(h, 128), min(w, 128)
        h0, w0 = (h - ch) // 2, (w - cw) // 2
        probe = HsiSample(
            noisy=noisy[h0 : h0 + ch, w0 : w0 + cw],
            mask=mask[h0 : h0 + ch, w0 : w0 + cw],
            clean=None,
        )
        dictionary = _auto_dictionary(probe, cfg)
    if scan is None:
        scan = cfg.variant == "lrs_pnp"
    return solve_tiled(
        noisy, mask, dictionary, cfg,
        tile_shape=tile_shape, tile_batch=tile_batch,
        overlap=overlap, n_iters=n_iters,
        net=net, verbose=verbose, scan=scan, pad_final=pad_final,
    )

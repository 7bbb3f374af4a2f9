"""Whole-scene recovery by tile streaming — the production large-cube path.

Splits an arbitrarily large (H, W, B) scene into spatial tiles
(:mod:`..data.tiles`), solves each batch of tiles in lockstep through ONE
compiled vmapped ADMM step (compiled once, reused for every batch — the
final partial batch is padded to keep the shape static), and stitches the
recovered tiles back with overlap averaging.  The tile feeder prefetches
on a host thread (C++ extractor) while the device solves the previous
batch.

This is the capability the reference lacked entirely: it could only ever
process one hard-coded 36x36 crop per script run.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import numpy as np

from ..data.io import HsiSample
from ..data.tiles import TileLoader
from ..utils.config import SolverConfig
from .admm import build_step, init_state, make_consts
from .batch import stack_consts, stack_states


@functools.lru_cache(maxsize=16)
def _tiled_engine(config: SolverConfig, tile3, scan: bool, net):
    """Compiled tile-batch engine, cached across :func:`solve_tiled` calls
    (config and flax modules are frozen/hashable): repeated scene solves —
    and the warm bench pass — reuse the jit cache instead of re-tracing
    and re-(remote-)compiling per call."""
    vstep = jax.vmap(build_step(config, tile3, net=net), in_axes=(0, 0))
    if not scan:
        return jax.jit(vstep)

    @functools.partial(jax.jit, static_argnames=("length",))
    def run_batch(state, consts, length):
        return jax.lax.scan(
            lambda st, _: (vstep(st, consts)[0], None),
            state, None, length=length,
        )[0]

    return run_batch


def solve_tiled(
    noisy: np.ndarray,  # (H, W, B) observed scene (missing pixels = 0)
    mask: np.ndarray,  # (H, W) observation mask
    dictionary: np.ndarray,
    config: SolverConfig,
    tile_shape: Tuple[int, int] = (36, 36),
    tile_batch: int = 8,
    overlap: int = 0,
    n_iters: Optional[int] = None,
    net=None,
    verbose: bool = False,
    scan: bool = True,
    pad_final: bool = False,
) -> np.ndarray:
    """Recover the whole scene tile-by-tile; returns (H, W, B).

    ``overlap`` > 0 strides tiles by (tile - overlap) and averages the
    overlapping recoveries (seam suppression).

    ``scan=True`` (default) runs all ``n`` outer iterations of a tile
    batch as ONE on-device ``lax.scan`` — one dispatch per batch instead
    of ``n`` (at ~5 ms/dispatch the host-stepped loop dominates wall time
    for production iteration counts).  CAUTION for DIP variants at
    ensemble scale: a scan-of-N of a wide vmapped DIP step is exactly the
    program shape measured to crash the remote TPU compiler (CLAUDE.md,
    round 4) — for large ``tile_batch`` x production ``n_iters`` DIP runs
    pass ``scan=False`` (host-stepped escape hatch) or keep the per-batch
    program small.

    A final PARTIAL batch runs at its real size by default — device work
    scales with the number of real tiles (a 4-tile scene with
    ``tile_batch=8`` does 4 lanes of work, not 8).  ``pad_final=True``
    instead pads it by duplicating samples so the compiled executable is
    reused — trades wasted lanes for skipping one extra (remote) compile,
    worthwhile when the per-batch program is expensive to compile and the
    remainder is small.
    """
    h, w, b = noisy.shape
    th, tw = tile_shape
    stride = (th - overlap, tw - overlap) if overlap else None
    loader = TileLoader(
        np.ascontiguousarray(noisy, np.float32), (th, tw),
        batch_size=tile_batch, stride=stride,
    )
    n = config.outer_iters if n_iters is None else n_iters
    engine = _tiled_engine(config, (th, tw, b), scan, net)
    if scan:
        run_batch = engine
    else:
        step = engine

    out = np.zeros((h, w, b), np.float64)
    weight = np.zeros((h, w, 1), np.float64)

    for tiles, origins in loader.batches():
        n_real = len(origins)
        samples = [
            HsiSample(noisy=t, mask=mask[h0 : h0 + th, w0 : w0 + tw])
            for t, (h0, w0) in zip(tiles, origins)
        ]
        if pad_final:
            # pad by duplication so the compiled shape stays constant
            # (extras sliced away below; costs n_pad wasted device lanes)
            while len(samples) < tile_batch:
                samples.append(samples[-1])
        consts_list = [make_consts(s, dictionary, config) for s in samples]
        consts = stack_consts(consts_list)
        # init from the already-uploaded consts.Y (X starts at the observed
        # image) — avoids re-uploading every tile over the slow tunnel
        state = stack_states(
            [init_state(c.Y, config.seed + i) for i, c in enumerate(consts_list)]
        )
        if scan:
            state = run_batch(state, consts, n)
        else:
            for _ in range(n):
                state, aux = step(state, consts)
        cubes = np.asarray(state.X).reshape(-1, th, tw, b)[:n_real]
        for cube, (h0, w0) in zip(cubes, origins):
            out[h0 : h0 + th, w0 : w0 + tw] += cube
            weight[h0 : h0 + th, w0 : w0 + tw] += 1.0
        if verbose:
            print(f"solved {n_real} tiles at origin {tuple(origins[0])}", flush=True)

    return (out / np.maximum(weight, 1.0)).astype(np.float32)

"""Overlapping block extraction/scatter over the matricized (pixels x bands) image.

The reference extracts overlapping ``bb x bb`` blocks from the (H*W, B)
matrix — i.e. each block spans ``bb`` *consecutive spatial pixels* by ``bb``
*consecutive spectral bands* — with stride ``slidingDis`` and a
"always append the last row/column start if the extent is not divisible by
bb" rule (reference ``main_LRS_PnP_DIP_pro.py:123-157`` and the MATLAB twin
``my_im2col.m``).  Blocks are flattened column-major (band-major), matching
the dictionary's row space.

TPU-first design: the block-start grid is *static* for a given
(shape, bb, stride), so extraction is one advanced-indexing gather and the
inverse is one ``.at[].add`` scatter — both compile to single fused XLA ops
with no data-dependent shapes.  The block axis is the natural ``vmap`` /
``shard_map`` parallelism axis (the MATLAB twin used ``parfor`` here,
``main_LRS_PnP.m:100``).

Conventions (differs from the reference deliberately, for row-major batching):
  * ``extract_blocks`` returns ``(n_blocks, bb*bb)`` (reference keeps
    ``(bb*bb, n_blocks)``) — block index leads so it can shard;
  * element order inside a block is band-major
    (``blk[j, b_local*bb + p_local]``), identical to the reference's
    Fortran flatten of ``img[x:x+bb, y:y+bb]``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _start_indices(extent: int, bb: int, stride: int) -> np.ndarray:
    """Block start offsets along one axis, with the reference's append rule.

    Strided starts 0, stride, 2*stride, ... over the valid range
    [0, extent-bb]; if ``extent % bb != 0`` the last valid start
    (extent - bb) is appended (reference ``main_LRS_PnP_DIP_pro.py:130-141``:
    the final row/col of the valid-start matrix is marked).
    """
    last = extent - bb
    if last < 0:
        raise ValueError(
            f"block_size {bb} exceeds extent {extent}; blocks must fit inside "
            "the matricized image"
        )
    starts = list(range(0, last + 1, stride))
    if extent % bb != 0 and starts[-1] != last:
        starts.append(last)
    return np.asarray(starts, dtype=np.int32)


@dataclasses.dataclass(frozen=True)
class BlockGrid:
    """Static description of the overlapping-block layout.

    ``x_starts``/``y_starts`` are the per-block pixel-row / band-column
    start offsets, ordered the way the reference orders blocks: the start
    matrix is scanned column-major (Fortran), i.e. all pixel starts for the
    first band start, then the next band start, ... (reference
    ``main_LRS_PnP_DIP_pro.py:144-149``).
    """

    shape: Tuple[int, int]  # (n_pixels, n_bands) of the matricized image
    block_size: int
    stride: int
    x_starts: Tuple[int, ...]  # per block, pixel-axis start
    y_starts: Tuple[int, ...]  # per block, band-axis start

    @property
    def n_blocks(self) -> int:
        return len(self.x_starts)

    @property
    def patch_dim(self) -> int:
        return self.block_size * self.block_size

    def weight(self) -> jnp.ndarray:
        """Per-entry block-coverage count (reference ``Weight``)."""
        ones = jnp.ones((self.n_blocks, self.patch_dim), dtype=jnp.float32)
        return scatter_blocks(ones, self)


@functools.lru_cache(maxsize=None)
def block_grid(shape: Tuple[int, int], block_size: int, stride: int) -> BlockGrid:
    """Build the static block grid for a matricized image shape."""
    n_pix, n_band = shape
    xs = _start_indices(n_pix, block_size, stride)
    ys = _start_indices(n_band, block_size, stride)
    # Reference ordering: start-matrix scanned in Fortran order ->
    # y (band) start is the slow axis.
    x_rep = np.tile(xs, len(ys))
    y_rep = np.repeat(ys, len(xs))
    return BlockGrid(
        shape=(int(n_pix), int(n_band)),
        block_size=int(block_size),
        stride=int(stride),
        x_starts=tuple(int(v) for v in x_rep),
        y_starts=tuple(int(v) for v in y_rep),
    )


@functools.lru_cache(maxsize=None)
def _regular_layout(grid: BlockGrid):
    """Structured fast-path check: when the pixel-axis starts are exactly
    the non-overlapping covering grid (stride == bb and P % bb == 0 — true
    for every reference geometry, ``slidingDis = bb = 36``), extraction and
    scatter decompose per band-start into pure reshape/transpose plus
    STATIC slice adds.  The general gather/scatter fallback lowers to an
    XLA scatter op, which TPU executes (near-)serially — at 144x144x128
    (2304 x 1296 elements x 3 scatters per outer iteration) that, not the
    MXU work, dominated the round-4 large-cube bench.

    Returns (xs, ys) start tuples, or None when irregular."""
    bb, stride = grid.block_size, grid.stride
    P, B = grid.shape
    if stride != bb or P % bb != 0:
        return None
    xs = tuple(int(v) for v in _start_indices(P, bb, stride))
    ys = tuple(int(v) for v in _start_indices(B, bb, stride))
    if len(xs) * len(ys) != grid.n_blocks:
        return None
    if xs != tuple(range(0, P - bb + 1, bb)):
        return None
    return xs, ys


def _gather_indices(grid: BlockGrid):
    bb = grid.block_size
    xs = jnp.asarray(grid.x_starts, dtype=jnp.int32)  # (nB,)
    ys = jnp.asarray(grid.y_starts, dtype=jnp.int32)
    d = jnp.arange(bb, dtype=jnp.int32)
    # rows: (nB, 1, bb) pixel indices; cols: (nB, bb, 1) band indices —
    # broadcasting yields (nB, bb, bb) = [block, band_local, pixel_local],
    # so a C-order flatten of the trailing two axes is band-major.
    rows = xs[:, None, None] + d[None, None, :]
    cols = ys[:, None, None] + d[None, :, None]
    return rows, cols


def extract_blocks(Y: jnp.ndarray, grid: BlockGrid) -> jnp.ndarray:
    """Gather all blocks: (P, B) -> (n_blocks, bb*bb), band-major entries."""
    bb = grid.block_size
    fast = _regular_layout(grid)
    if fast is not None:
        xs, ys = fast
        nx = len(xs)
        parts = []
        for y0 in ys:
            seg = Y[:, y0 : y0 + bb].reshape(nx, bb, bb)  # [xblk, pix, band]
            parts.append(seg.transpose(0, 2, 1).reshape(nx, bb * bb))
        return jnp.concatenate(parts, axis=0)
    rows, cols = _gather_indices(grid)
    return Y[rows, cols].reshape(grid.n_blocks, bb * bb)


def scatter_blocks(blocks: jnp.ndarray, grid: BlockGrid) -> jnp.ndarray:
    """Adjoint of :func:`extract_blocks`: sum-scatter blocks back to (P, B).

    Overlapping contributions accumulate (reference ``IMout`` /
    ``lambda1_summation`` accumulation, ``main_LRS_PnP_DIP_pro.py:435-447``).
    """
    bb = grid.block_size
    fast = _regular_layout(grid)
    if fast is not None:
        xs, ys = fast
        nx = len(xs)
        P = grid.shape[0]
        out = jnp.zeros(grid.shape, dtype=blocks.dtype)
        b3 = blocks.reshape(grid.n_blocks, bb, bb)  # [block, band, pixel]
        for k, y0 in enumerate(ys):
            seg = b3[k * nx : (k + 1) * nx].transpose(0, 2, 1).reshape(P, bb)
            # static slice-add: lowers to dynamic-update-slice fusion, not
            # an XLA scatter (band-start overlaps accumulate via +=)
            out = out.at[:, y0 : y0 + bb].add(seg)
        return out
    rows, cols = _gather_indices(grid)
    out = jnp.zeros(grid.shape, dtype=blocks.dtype)
    return out.at[rows, cols].add(blocks.reshape(grid.n_blocks, bb, bb))

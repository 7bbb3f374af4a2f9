"""Tiled-cube data pipeline for large hyperspectral scenes.

The large tiled-cube workload (BASELINE config 5) processes an H x W x B
scene far bigger than device memory appetite as a stream of spatial tiles.
This module provides:

  * ``tile_origins``: the tile grid (with the same "always cover the last
    row/col" rule as the block grid);
  * ``TileLoader``: a double-buffered prefetching iterator over tiles —
    extraction happens on a background thread via the C++ native library
    (memcpy + OpenMP, ``native/lrs_native.cc::extract_tiles``) with a pure
    NumPy fallback, so the accelerator never waits on host slicing;
  * ``mmap_cube``: zero-copy load of an ``.npy`` cube.

The reference has no data pipeline at all (it loads one 36x36 crop per
script run); this is new capability sized for production scenes.
"""

from __future__ import annotations

import concurrent.futures
import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


def tile_origins(
    height: int, width: int, tile_h: int, tile_w: int,
    stride_h: Optional[int] = None, stride_w: Optional[int] = None,
) -> np.ndarray:
    """(N, 2) array of (h0, w0) origins covering the scene; the final
    row/col of tiles is pulled in so every pixel is covered."""

    def starts(extent, size, stride):
        stride = stride or size
        s = list(range(0, extent - size + 1, stride))
        if not s or s[-1] != extent - size:
            s.append(extent - size)
        return s

    hs = starts(height, tile_h, stride_h)
    ws = starts(width, tile_w, stride_w)
    return np.asarray([(h, w) for h in hs for w in ws], dtype=np.int32)


def mmap_cube(path: str) -> np.ndarray:
    """Memory-map a .npy (H, W, B) float32 cube."""
    return np.load(path, mmap_mode="r")


def _extract_batch_numpy(cube, origins, th, tw):
    out = np.empty((len(origins), th, tw, cube.shape[2]), np.float32)
    for i, (h0, w0) in enumerate(origins):
        out[i] = cube[h0 : h0 + th, w0 : w0 + tw, :]
    return out


def _extract_batch_native(cube, origins, th, tw):
    from .. import native

    cube = np.ascontiguousarray(cube, np.float32)
    origins = np.ascontiguousarray(origins, np.int32)
    out = np.empty((len(origins), th, tw, cube.shape[2]), np.float32)
    lib = native._load()
    import ctypes

    lib.extract_tiles.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    lib.extract_tiles(
        cube, cube.shape[0], cube.shape[1], cube.shape[2],
        origins.reshape(-1), len(origins), th, tw, out.reshape(-1),
    )
    return out


class TileLoader:
    """Double-buffered tile-batch iterator.

    While batch k is being consumed (e.g. by the solver on device), batch
    k+1 is extracted on a background thread.
    """

    def __init__(
        self,
        cube: np.ndarray,
        tile_shape: Tuple[int, int],
        batch_size: int = 8,
        stride: Optional[Tuple[int, int]] = None,
        use_native: Optional[bool] = None,
    ):
        self.cube = cube
        self.th, self.tw = tile_shape
        self.batch_size = batch_size
        sh, sw = stride or (None, None)
        self.origins = tile_origins(
            cube.shape[0], cube.shape[1], self.th, self.tw, sh, sw
        )
        if use_native is None:
            from .. import native

            use_native = (
                native.available()
                and isinstance(cube, np.ndarray)
                and bool(cube.flags["C_CONTIGUOUS"])
            )
        self._extract = _extract_batch_native if use_native else _extract_batch_numpy
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)

    @property
    def n_tiles(self) -> int:
        return len(self.origins)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        return self.batches()

    def batches(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield (tiles, origins) with background prefetch."""
        batch_list = [
            self.origins[i : i + self.batch_size]
            for i in range(0, len(self.origins), self.batch_size)
        ]
        if not batch_list:
            return
        future = self._pool.submit(
            self._extract, self.cube, batch_list[0], self.th, self.tw
        )
        for j in range(len(batch_list)):
            cur = future.result()
            if j + 1 < len(batch_list):
                future = self._pool.submit(
                    self._extract, self.cube, batch_list[j + 1], self.th, self.tw
                )
            yield cur, batch_list[j]

"""ctypes bindings to the native host library (``native/liblrs_native.so``).

Native components (the framework's counterpart to the reference's MEX/
Cython surface, SURVEY §2.4): pairwise fast-NLM, OpenMP-batched column
NLM, and im2col extract/scatter.  Used as independent test oracles, as a
host-side preprocessing path, and (via ``jax.pure_callback``) as an
optional CPU denoiser plug-in.

The library auto-builds with ``make -C native`` on first use if a
toolchain is available; all public functions raise ``NativeUnavailable``
cleanly when it isn't.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblrs_native.so")


class NativeUnavailable(RuntimeError):
    pass


_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the native library (make -C native). Returns the .so path."""
    if force and os.path.exists(_LIB_PATH):
        os.remove(_LIB_PATH)
    if not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    try:
        build()
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        raise NativeUnavailable(f"cannot build liblrs_native: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.nlm2d.argtypes = [f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
                          ctypes.c_int, ctypes.c_int, f32p]
    lib.nlm_column_batch.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p,
                                     ctypes.c_int, ctypes.c_int, f32p]
    lib.n_blocks.argtypes = [ctypes.c_int] * 4
    lib.n_blocks.restype = ctypes.c_int
    lib.extract_blocks.argtypes = [f32p] + [ctypes.c_int] * 4 + [f32p]
    lib.scatter_blocks.argtypes = [f32p] + [ctypes.c_int] * 4 + [f32p, f32p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def nlm2d(image: np.ndarray, h: float, patch_size: int = 3,
          patch_distance: int = 3) -> np.ndarray:
    lib = _load()
    image = np.ascontiguousarray(image, np.float32)
    out = np.empty_like(image)
    lib.nlm2d(image, image.shape[0], image.shape[1], h, patch_size,
              patch_distance, out)
    return out


def nlm_column_batch(vecs: np.ndarray, h: np.ndarray, patch_size: int = 3,
                     patch_distance: int = 3) -> np.ndarray:
    lib = _load()
    vecs = np.ascontiguousarray(vecs, np.float32)
    h = np.ascontiguousarray(h, np.float32)
    out = np.empty_like(vecs)
    lib.nlm_column_batch(vecs, vecs.shape[0], vecs.shape[1], h, patch_size,
                         patch_distance, out)
    return out


def extract_blocks(Y: np.ndarray, block_size: int, stride: int) -> np.ndarray:
    lib = _load()
    Y = np.ascontiguousarray(Y, np.float32)
    nb = lib.n_blocks(Y.shape[0], Y.shape[1], block_size, stride)
    out = np.empty((nb, block_size * block_size), np.float32)
    lib.extract_blocks(Y, Y.shape[0], Y.shape[1], block_size, stride, out)
    return out


def scatter_blocks(blocks: np.ndarray, shape: Tuple[int, int],
                   block_size: int, stride: int) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    blocks = np.ascontiguousarray(blocks, np.float32)
    out = np.empty(shape, np.float32)
    weight = np.empty(shape, np.float32)
    lib.scatter_blocks(blocks, shape[0], shape[1], block_size, stride, out, weight)
    return out, weight

"""Mask generators and synthetic corruption.

Covers the reference's three mask sources:
  * random Bernoulli masks (reference ``utils/inpainting_utils.py:19-22``),
  * rendered-text masks (reference ``utils/inpainting_utils.py:7-17``),
  * hand-coded dead-pixel strip masks like the MATLAB original
    (reference ``LRS-PnP(Matlab Code)/main_LRS_PnP.m:31-47``).

``corrupt`` builds an observation from a clean cube the way the reference
data was built: add i.i.d. gaussian noise (sigma = 0.12 in all reference
configs, ``main_LRS_PnP.m:23-26``) on every pixel, then zero out masked
pixels across all bands.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence, Tuple

import numpy as np


def bernoulli_mask(
    shape: Tuple[int, int], keep_prob: float, seed: int = 0
) -> np.ndarray:
    """Random keep-mask: 1 with probability ``keep_prob``."""
    rng = np.random.default_rng(seed)
    return (rng.random(shape) < keep_prob).astype(np.float32)


def strip_mask(
    shape: Tuple[int, int],
    strips: Sequence[Tuple[int, int, int, int]],
) -> np.ndarray:
    """Mask with rectangular dead regions.

    ``strips`` is a sequence of (row0, row1, col0, col1) half-open boxes to
    mark missing (0).  Mirrors the MATLAB hand-built strip masks.
    """
    mask = np.ones(shape, dtype=np.float32)
    for r0, r1, c0, c1 in strips:
        mask[r0:r1, c0:c1] = 0.0
    return mask


#: The hand-built strip boxes of the MATLAB twin, converted from the
#: 1-indexed inclusive ``msk(r0:r1, c0:c1) = 1000`` statements at
#: ``main_LRS_PnP.m:34-38`` to 0-indexed half-open (row0, row1, col0, col1).
#: Together they kill 66 of the 1296 pixels — the same density as the
#: Python reference's first mask (BASELINE.md mask table).
MATLAB_STRIPS = (
    (7, 13, 26, 28),
    (3, 5, 6, 12),
    (17, 24, 4, 6),
    (15, 17, 12, 19),
    (23, 25, 12, 19),
)


def matlab_strip_mask(shape: Tuple[int, int] = (36, 36)) -> np.ndarray:
    """The exact strip mask of ``main_LRS_PnP.m:31-43`` (36x36, 66 dead
    pixels, identical across all 128 bands)."""
    return strip_mask(shape, MATLAB_STRIPS)


def matlab_twin_sample(seed: int = 0, bands: int = 128):
    """The assembled MATLAB-twin experiment input (A12,
    ``main_LRS_PnP.m:4-47``): a 36x36x``bands`` clean cube, sigma=0.12
    gaussian noise on every pixel, then the hand-built strip mask zeroing
    66 pixels across all bands.

    The reference crops the Chikusei scene (rows/cols 50:85 of the
    144x144x128 cube, ``main_LRS_PnP.m:16-18``); that ``Chikusei.mat`` is
    a missing git-LFS blob (SURVEY §0), so the clean cube here is the
    framework's synthetic Chikusei-like low-rank mixture — same geometry,
    noise and mask as the MATLAB experiment.
    """
    from .io import HsiSample

    base = synthetic_sample(
        height=36, width=36, bands=bands, rank=8, missing=0.0,
        noise_sigma=0.0, seed=seed,
    )
    mask = matlab_strip_mask((36, 36))
    noisy = corrupt(base.clean, mask, noise_sigma=0.12, seed=seed)
    return HsiSample(noisy=noisy, mask=mask, clean=base.clean, name="matlab_twin")


def text_mask(
    shape: Tuple[int, int],
    text: str = "hello world",
    font_size: Optional[int] = None,
) -> np.ndarray:
    """Render text as missing pixels (0 where the glyphs are)."""
    from PIL import Image, ImageDraw, ImageFont

    h, w = shape
    img = Image.new("L", (w, h), 255)
    draw = ImageDraw.Draw(img)
    try:
        font = ImageFont.load_default(size=font_size) if font_size else ImageFont.load_default()
    except TypeError:  # older PIL without size kwarg
        font = ImageFont.load_default()
    draw.text((1, h // 3), text, fill=0, font=font)
    return (np.asarray(img, dtype=np.float32) > 127).astype(np.float32)


def corrupt(
    clean: np.ndarray,
    mask: np.ndarray,
    noise_sigma: float = 0.12,
    seed: int = 0,
) -> np.ndarray:
    """clean (H,W,B) + N(0, sigma^2) noise, then masked pixels zeroed."""
    rng = np.random.default_rng(seed)
    noisy = clean + noise_sigma * rng.standard_normal(clean.shape)
    noisy = noisy * mask[..., None]
    return noisy.astype(np.float32)


def synthetic_sample(
    height: int = 36,
    width: int = 36,
    bands: int = 128,
    rank: int = 6,
    missing: float = 0.05,
    noise_sigma: float = 0.12,
    seed: int = 0,
):
    """A synthetic low-rank-ish HSI problem for tests and benchmarks.

    The cube is a rank-``rank`` mixture of smooth spatial abundance maps and
    smooth spectral endmembers, which gives it both the low-rank spectral
    structure and local spatial correlation the solver priors exploit.
    """
    from .io import HsiSample

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    maps = []
    for _ in range(rank):
        cy, cx = rng.uniform(0, height), rng.uniform(0, width)
        s = rng.uniform(height / 6, height / 2)
        maps.append(np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))))
    A = np.stack(maps, -1)  # (H, W, R)
    t = np.linspace(0, 1, bands)
    E = np.stack(
        [
            0.5 + 0.4 * np.sin(2 * np.pi * rng.uniform(0.5, 3.0) * t + rng.uniform(0, 2 * np.pi))
            for _ in range(rank)
        ],
        0,
    )  # (R, B)
    clean = np.einsum("hwr,rb->hwb", A, E)
    clean = (clean - clean.min()) / (clean.max() - clean.min() + 1e-12) * 0.65
    clean = clean.astype(np.float32)
    mask = bernoulli_mask((height, width), 1.0 - missing, seed=seed + 1)
    noisy = corrupt(clean, mask, noise_sigma=noise_sigma, seed=seed + 2)
    return HsiSample(noisy=noisy, mask=mask, clean=clean, name="synthetic")

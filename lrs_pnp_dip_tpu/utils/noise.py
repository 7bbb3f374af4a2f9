"""DIP input helpers (reference ``utils/common_utils.py:155-273``).

``get_noise``: uniform/normal noise input tensor, 2-D ``(1, H, W, C)`` or
3-D ``(1, D, H, W, C)`` (NHWC/NDHWC here), scaled by ``var`` (reference
multiplies by 1/10).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def get_noise(
    key,
    input_depth: int,
    spatial_size: Sequence[int],
    method: str = "noise",
    noise_type: str = "u",
    var: float = 0.1,
) -> jnp.ndarray:
    """Noise (or meshgrid) DIP input.

    method 'noise': random tensor (1, *spatial, input_depth);
    method 'meshgrid': normalized 2-channel coordinate grid.
    """
    if method == "noise":
        shape = (1, *spatial_size, input_depth)
        if noise_type == "u":
            x = jax.random.uniform(key, shape)
        elif noise_type == "n":
            x = jax.random.normal(key, shape)
        else:
            raise ValueError(noise_type)
        return x * var
    if method == "meshgrid":
        assert input_depth == 2 and len(spatial_size) == 2
        h, w = spatial_size
        yy, xx = jnp.meshgrid(
            jnp.arange(h) / float(h - 1), jnp.arange(w) / float(w - 1), indexing="ij"
        )
        return jnp.stack([yy, xx], axis=-1)[None]
    raise ValueError(method)

"""Device-mesh construction.

Axis convention for the whole framework (SURVEY §2.5):

  * ``data``  — independent recovery problems (images x masks); DIP
    training is data-parallel along it (grad psum over ICI when a net is
    shared, independent nets otherwise);
  * ``patch`` — the pixel/patch dimension: the 144-block axis of the
    sparse prox (embarrassingly parallel, the MATLAB twin's ``parfor``)
    and the pixel-row axis of the (P, B) iterate for the Gram-psum SVT.

The reference has no distribution at all; this layer is new capability.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a Mesh with named axes.

    ``make_mesh({"data": 2, "patch": 4})`` → 2x4 mesh.  With no argument,
    all local devices go on the ``patch`` axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {"data": 1, "patch": len(devices)}
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes[n] for n in names)
    n = int(np.prod(sizes))
    if n != len(devices):
        raise ValueError(f"mesh {axis_sizes} needs {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices).reshape(sizes), names)


def mesh_axis_sizes(mesh: Mesh) -> Dict[str, int]:
    return dict(zip(mesh.axis_names, mesh.devices.shape))

"""Device mesh construction (SURVEY §2c P4-P5).

The reference has no distribution at all (single GPU, ``README.md:17``);
here the communication "backend" is mesh construction + named shardings +
XLA collectives over ICI/DCN — no custom transport layer.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    ``make_mesh()`` -> 1-axis 'data' mesh over all devices.
    ``make_mesh((2, 4), ('data', 'graph'))`` -> 2x4 mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    assert int(np.prod(axis_sizes)) == len(devices), (
        f"mesh {tuple(axis_sizes)} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(arr, tuple(axis_names))

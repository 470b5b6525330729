"""Device mesh construction.

Single-axis tensor parallelism over ICI is the primary layout (SURVEY.md
§2.3: TP is first-class; PP/DP optional). Multi-host: call
``jax.distributed.initialize()`` before building the mesh — the mesh
helper itself is host-count agnostic because it builds from
``jax.devices()``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(
    shape: Tuple[int, ...] = (-1,),
    axes: Sequence[str] = ("tp",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ``Mesh`` over the available devices.

    ``-1`` in ``shape`` absorbs all remaining devices (like a reshape).
    Default: one "tp" axis over every device — ICI-adjacent devices end
    up adjacent on the axis, so the TP collectives ride ICI.
    """
    devs = list(devices if devices is not None else jax.devices())
    shape = tuple(shape)
    known = int(np.prod([s for s in shape if s != -1]))
    if -1 in shape:
        shape = tuple(len(devs) // known if s == -1 else s for s in shape)
    n = int(np.prod(shape))
    if n > len(devs):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devs)}")
    arr = np.asarray(devs[:n]).reshape(shape)
    return Mesh(arr, tuple(axes))

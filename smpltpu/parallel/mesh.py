"""Device-mesh helpers.

The natural parallel axis of this workload is FRAMES (and sliding windows
of frames): per-frame residual/Jacobian assembly is independent, the shared
shape block reduces with one psum over the frame axis, and the temporal
stencil only touches nearest neighbors (one ppermute halo row per side) —
so all collectives ride the ICI ring (SURVEY.md section 2.4 design note).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def frames_mesh(n_devices: int | None = None, axis: str = "frames") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_frames(mesh: Mesh, arr, axis: str = "frames"):
    """Place `arr` with its leading (frame/window) axis sharded over the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))
